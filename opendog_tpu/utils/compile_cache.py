"""Persistent XLA compilation cache (VERDICT r4 item 6).

The headline bench's compile stage is dominated by the remote compile
service behind the axon tunnel: the same MPC tick program compiled in
~180 s (r03) and 981 s (r04) purely on service weather.  JAX's persistent
compilation cache serializes the compiled executable to disk keyed by HLO
fingerprint, so every process after the first skips the service entirely
(measured on the tunnel: a cache-hit ``lowered.compile()`` is ~0.02 s; the
remaining first-execution cost is program *load*, not compile).

Call :func:`enable` before building any jitted program.  bench.py and the
heavyweight scripts do; tests don't need to (tiny CPU programs).
"""
import os


def enable(path: str = None) -> str:
    """Point JAX at a persistent on-disk compilation cache.

    ``path`` defaults to ``$OPENDOG_XLA_CACHE`` or ``<repo>/.xla_cache``
    (gitignored).  Returns the cache dir so callers can report it.
    Safe to call more than once and before/after backend init (JAX reads
    the config at compile time)."""
    import jax

    if path is None:
        path = os.environ.get("OPENDOG_XLA_CACHE")
    if path is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        path = os.path.join(repo, ".xla_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache anything that took >=0.5 s: the big MPC graphs are minutes,
    # but the warm-up/settling programs around them are seconds and safe
    # to skip on re-runs too
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
