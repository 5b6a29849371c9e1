"""Domain-DSL wrappers: the engine's analog of the reference's custom-graph
extension surface (reference: src/fermor/custom_graph.clj:46-66, 410-530 and
README.md:41-46 — "build your own DSL").

Where the reference auto-lifts protocol results back into user wrapper types
via compiled delegation, the Python shape is plain subclassing: a domain
Route subclass whose steps are named after the domain and return the
subclass (so chains stay in the DSL), plus a graph wrapper exposing typed
entry points. ``DomainRoute._with`` preserves the subclass through every
inherited step — the equivalent of the reference's result auto-lifting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from fermor_spark.graph import PropertyGraph
from fermor_spark.route import Route


class DomainRoute(Route):
    """Base for domain DSL routes: inherited traversal steps return the
    subclass, so user-defined domain steps chain with core steps freely."""

    def _with(self, df: DataFrame, etype: str | None = None) -> "DomainRoute":
        r = type(self)(self.g, df, etype or self.etype)
        r._broadcast_frontier = getattr(self, "_broadcast_frontier", False)
        # same one-hop auto-hint semantics as Route._with: a DSL chain
        # rooted at is_/one_of gets the point-frontier broadcast on its
        # first hop too (and _edge_join consumes it identically)
        r._bcast_auto = getattr(self, "_bcast_auto", False)
        return r


class DomainGraph(PropertyGraph):
    """Base for domain graph wrappers. Subclasses declare `route_cls` and
    typed entry points."""

    route_cls: type = DomainRoute

    @classmethod
    def wrap(cls, g: PropertyGraph) -> "DomainGraph":
        w = cls(g.spark, g.V, g.E, g.edge_builders, forked=g.is_forked,
                materialized_vertices=g.materialized_vertices)
        return w

    def _route(self, df: DataFrame, etype: str = "v"):
        return self.route_cls(self, df, etype)


# --------------------------------------------------------------------------
# Worked example over the job-graph fixture schema (the reference's own
# running example): a hiring-domain DSL.

class HiringRoute(DomainRoute):
    def applications(self) -> "HiringRoute":
        """person → applications they completed."""
        return self.out("completes")

    def jobs(self) -> "HiringRoute":
        """application → jobs applied to."""
        return self.out("appliesTo")

    def company(self) -> "HiringRoute":
        """job → creating company."""
        return self.in_("created")

    def applicants(self) -> "HiringRoute":
        """job → people with an application for it."""
        return self.in_("appliesTo").in_("completes")


class HiringGraph(DomainGraph):
    route_cls = HiringRoute

    def people(self) -> HiringRoute:
        return self._route(
            self.vertices().has_property("type", "person").df.select("id")
        )

    def companies(self) -> HiringRoute:
        return self._route(
            self.vertices().has_property("type", "company").df.select("id")
        )
