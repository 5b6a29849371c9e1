"""Pluggable condition handlers — the reference's pure-conditioning surface.

The reference signals named conditions instead of raising directly
(:vertex-not-found src/fermor/core.clj:254, :on-cycle core.clj:1365,
:missing-documents core.clj:104,128); a dynamically-bound handler decides
the outcome (substitute a value, break or continue a cycle), and an
unhandled signal escalates to an error. The Python analog here: a handler
registry consulted by ``signal``; with no handler installed, ``signal``
raises :class:`Condition`. Handlers bind globally (:func:`set_handler`) or
lexically (:func:`handling`, a context manager — the shape closest to the
reference's dynamic scope).

A handler receives the signal's context dict and its return value becomes
the ``signal`` call's result, which each signaling site interprets per its
documented contract (e.g. get_vertex_checked returns it as the default;
no_cycles treats truthy as "continue cycling", falsy as "truncate").
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Callable

Handler = Callable[[dict], Any]

_HANDLERS: dict[str, Handler] = {}

_UNHANDLED = object()  # sentinel: no handler bound for the signal


class Condition(KeyError, ValueError):
    """An unhandled condition signal (reference: `error` escalation in
    pure-conditioning forms, src/fermor/core.clj:254, 1365).

    Subclasses KeyError and ValueError so call sites keep their natural
    Python idiom — ``except KeyError`` around a point lookup,
    ``except ValueError`` around a cycle assertion — while the condition
    machinery stays uniform."""

    def __init__(self, name: str, message: str, context: dict | None = None):
        super().__init__(f"{name}: {message}")
        self.name = name
        self.context = dict(context or {})

    def __str__(self) -> str:  # KeyError.__str__ shows repr; keep plain
        return self.args[0]


def set_handler(name: str, fn: Handler | None) -> None:
    """Bind (or with ``None``, unbind) the global handler for ``name``."""
    if fn is None:
        _HANDLERS.pop(name, None)
    else:
        _HANDLERS[name] = fn


def get_handler(name: str) -> Handler | None:
    return _HANDLERS.get(name)


@contextmanager
def handling(name: str, fn: Handler):
    """Lexically-scoped handler binding::

        with handling("vertex-not-found", lambda ctx: None):
            v = g.get_vertex_checked("missing")   # -> None, no raise
    """
    prev_present = name in _HANDLERS
    prev = _HANDLERS.get(name)
    _HANDLERS[name] = fn
    try:
        yield
    finally:
        if prev_present:
            _HANDLERS[name] = prev  # type: ignore[assignment]
        else:
            _HANDLERS.pop(name, None)


def signal(name: str, message: str, **context) -> Any:
    """Signal condition ``name``: run its handler if one is bound, else
    raise :class:`Condition`. Returns the handler's return value."""
    fn = _HANDLERS.get(name)
    if fn is None:
        raise Condition(name, message, context)
    return fn(context)


def signal_or(name: str, **context) -> Any:
    """Like :func:`signal` but returns the ``_UNHANDLED`` sentinel instead
    of raising when no handler is bound — for sites whose unhandled
    behavior is something other than an exception."""
    fn = _HANDLERS.get(name)
    if fn is None:
        return _UNHANDLED
    return fn(context)


def unhandled(result: Any) -> bool:
    return result is _UNHANDLED
