"""Progress reporting for long-running fits (reference FR-3.5).

Reference: ``/root/reference/crates/propagon/src/progress.rs:1-30`` — a
``Progress`` trait with no-op defaults (``start``/``update``/``message``/
``finish``) supplied via FitOptions; algorithms never print, the CLI
renders bars, bindings forward to callbacks, the default is silence.

Spark mapping: the iterative kernels already assemble a per-turn metrics
row (iteration counter, convergence delta, mass/normalization, seconds);
:class:`Progress` mirrors the reference surface and adds
:meth:`Progress.iteration`, which receives that whole row — a superset of
the reference's ``update(done)`` + ``message(err)`` pair, so a renderer
can show both a bar position and the live convergence error from one
hook. Kernels accept either a :class:`Progress` instance or a bare
``callable(phase, metrics_row)`` (wrapped in :class:`CallbackProgress`).

Callbacks run on the DRIVER between Spark jobs — they add no executor
overhead, and exceptions they raise propagate (fail fast, like any
user-supplied Python callback).
"""

from __future__ import annotations

from typing import Callable


class Progress:
    """No-op base: implementors override only what they render
    (``progress.rs:11-21``)."""

    def start(self, phase: str, total: int | None = None) -> None:
        """A new phase began (e.g. ``"pagerank"``), with an optional
        known total (``max_iterations`` for convergence-mode fits)."""

    def update(self, done: int) -> None:
        """Monotonic completion count within the current phase."""

    def message(self, msg: str) -> None:
        """Free-form status detail (e.g. current convergence error)."""

    def iteration(self, phase: str, metrics: dict) -> None:
        """One solver turn finished; ``metrics`` is the kernel's own
        per-turn row (the same dict appended to ``result.metrics``).
        Default: forward the iteration counter to :meth:`update`."""
        done = metrics.get("iteration", metrics.get("round"))
        if done is not None:
            self.update(int(done))

    def finish(self) -> None:
        """The current phase finished."""


class NoProgress(Progress):
    """The default: report nothing (``progress.rs:24-30``)."""


class CallbackProgress(Progress):
    """Adapt a bare ``callable(phase, metrics_row)`` to the surface."""

    def __init__(self, fn: Callable[[str, dict], None]):
        self._fn = fn

    def iteration(self, phase: str, metrics: dict) -> None:
        self._fn(phase, metrics)


#: shared silent sink (``progress.rs:30``)
SILENT = NoProgress()


def as_progress(progress) -> Progress:
    """Normalize a kernel's ``progress=`` argument: ``None`` → silent,
    a :class:`Progress` → itself, any callable → :class:`CallbackProgress`."""
    if progress is None:
        return SILENT
    if isinstance(progress, Progress):
        return progress
    if callable(progress):
        return CallbackProgress(progress)
    raise TypeError(
        f"progress must be None, a Progress, or callable(phase, metrics); "
        f"got {type(progress).__name__}"
    )
