"""Host-fingerprinted persistent-compile-cache path.

The XLA:CPU persistent cache stores AOT-compiled executables whose code is
specialized to the *compiling* host's CPU features. This VM migrates between
hosts: loading an artifact compiled with e.g. ``+prefer-no-scatter`` on a
host without it makes ``cpu_aot_loader`` warn "could lead to execution
errors such as SIGILL" — and intermittently SEGFAULTs test workers mid-run
(the round-2/round-3 xdist worker crashes reproduced exactly this way).

Keying the cache directory by a fingerprint of the host CPU feature set
makes each host population self-consistent; a migrated VM simply recompiles
into a fresh subdirectory instead of executing foreign machine code.
"""

from __future__ import annotations

import hashlib
import os

__all__ = ["host_cache_dir"]


def _cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def host_cache_dir(base: str) -> str:
    """``base`` extended with a per-host-CPU subdirectory."""
    return os.path.join(base, f"host-{_cpu_fingerprint()}")
