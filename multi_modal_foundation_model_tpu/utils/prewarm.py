"""AOT prewarming + transient-compile retry for remote/tunneled backends.

Big programs (e.g. a K=32-step ``lax.scan`` over an 80-session mixed step,
or a B=256 session-mixed step) intermittently abort while COMPILING through
a remote-compile window (``INTERNAL: ... remote_compile: read body:
response body closed`` — a server-side flake, not a property of the graph;
RESULTS.md round 4). These helpers make such programs measurable instead
of anecdotally dead:

- :func:`aot_compile` — ``jit(fn).lower(*args).compile()`` with retry +
  exponential backoff. The compiled executable lands in the persistent
  compilation cache (scripts/_common.py sets ``jax_compilation_cache_dir``),
  so the subsequent live call is a cache hit even in a fresh process.
- :func:`retry_transient` — wrap a jitted callable so a transient-compile
  abort on its FIRST (tracing) call is retried in place. Safe with donated
  arguments: donation invalidates buffers only once execution starts, and
  these failures happen strictly before that.

No reference counterpart (the reference compiles nothing ahead of time);
this is tunnel/remote-backend operational hardening.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterable

# error-message fragments that mark a retryable (server-side, transient)
# compile failure, as observed through the axon tunnel
TRANSIENT_MARKERS: tuple = (
    "remote_compile", "read body", "response body closed",
    "UNAVAILABLE", "DEADLINE_EXCEEDED", "Socket closed",
)


def is_transient_compile_error(err: BaseException,
                               markers: Iterable[str] = TRANSIENT_MARKERS
                               ) -> bool:
    msg = str(err)
    return any(m in msg for m in markers)


def aot_compile(jitted: Any, *args: Any, retries: int = 4,
                backoff_s: float = 15.0, log: Callable[[str], None] = print,
                **kwargs: Any):
    """``jitted.lower(*args, **kwargs).compile()`` with retry/backoff.

    Returns the compiled executable (callable with the same arguments).
    Lowering is host-side and done once; only ``.compile()`` — the part
    that crosses the remote-compile window — is retried. Non-transient
    errors raise immediately.
    """
    lowered = jitted.lower(*args, **kwargs)
    delay = backoff_s
    for attempt in range(retries + 1):
        try:
            return lowered.compile()
        except Exception as e:  # jaxlib XlaRuntimeError has no stable path
            if attempt >= retries or not is_transient_compile_error(e):
                raise
            log(f"prewarm: transient compile failure "
                f"(attempt {attempt + 1}/{retries + 1}), retrying in "
                f"{delay:.0f}s: {str(e)[:200]}")
            time.sleep(delay)
            delay *= 2


def retry_transient(fn: Callable, retries: int = 2,
                    backoff_s: float = 15.0,
                    log: Callable[[str], None] = print) -> Callable:
    """Wrap a (jitted) callable: retry calls that die on a transient
    remote-compile abort. ``retries=0`` returns ``fn`` unchanged."""
    if retries <= 0:
        return fn

    def wrapped(*args, **kwargs):
        delay = backoff_s
        for attempt in range(retries + 1):
            try:
                return fn(*args, **kwargs)
            except Exception as e:
                if attempt >= retries or not is_transient_compile_error(e):
                    raise
                log(f"retry_transient: attempt {attempt + 1}/"
                    f"{retries + 1} failed, retrying in {delay:.0f}s: "
                    f"{str(e)[:200]}")
                time.sleep(delay)
                delay *= 2

    wrapped.__name__ = getattr(fn, "__name__", "wrapped")
    return wrapped
