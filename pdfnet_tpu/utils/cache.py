"""Host-keyed persistent compilation cache directory.

XLA:CPU caches AOT-compiled machine code keyed only by the computation, not
by the host CPU's feature set.  When a persistent cache directory survives a
move to a different machine (VM migration between build rounds), loading
those executables can SIGILL/abort mid-run.  Keying the directory by the
host's CPU feature flags makes a migrated cache simply start cold instead.
"""

from __future__ import annotations

import hashlib
import platform


def host_cache_dir(prefix: str = "/tmp/jax_cache") -> str:
    """A compilation-cache path unique to this host's CPU feature set."""
    feat = ""
    # /proc/cpuinfo is NOT sufficient: two migration targets exposed
    # identical flags/model/stepping lines while XLA's LLVM host detection
    # (CPUID-based) still disagreed on tuning features
    # (prefer-no-gather/-scatter), and the stale AOT entries aborted at run
    # time.  boot_id is airtight: a migration implies a reboot, so entries
    # are only ever reused within the boot that compiled them — which is
    # the only window where cache warmth matters here.
    for src in ("/proc/sys/kernel/random/boot_id", "/proc/cpuinfo"):
        try:
            with open(src) as f:
                feat = f.readline()
            if feat:
                break
        except OSError:
            continue
    feat = feat or platform.processor() or platform.machine()
    tag = hashlib.sha1(feat.encode()).hexdigest()[:10]
    return f"{prefix}_{tag}"


def setup_cli_cache(cpu: bool) -> None:
    """CLI entry points: pick a persistent compile cache unless the process
    already configured one (e.g. tests/conftest.py's warm suite cache)."""
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    if jax.config.jax_compilation_cache_dir is None:
        # CPU executables are host-keyed (AOT code from another machine
        # aborts at load); TPU executables are compiled by the TPU runtime.
        cache = (host_cache_dir("/tmp/jax_cache_cpu") if cpu
                 else "/tmp/jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
