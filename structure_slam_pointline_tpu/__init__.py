"""TPU-native monocular point+line SLAM engine (JAX / XLA / Pallas / pjit).

A brand-new framework with the capabilities of Structure-SLAM (PointLine)
(reference: yanyan-li/Structure-SLAM-PointLine), re-designed TPU-first:

- batched feature front-end (image pyramid, FAST, oriented BRIEF, line
  segments + band descriptors) with fixed shapes and validity masks,
- matmul-based binary descriptor matching on the MXU,
- batched RANSAC two-view initialization,
- a single JAX Levenberg-Marquardt engine driving pose-only optimization,
  local bundle adjustment (sparse Schur complement over landmarks), Sim3
  solves and essential-graph pose-graph optimization,
- struct-of-arrays map store (keyframes / map points / map lines) with
  fixed capacities and alive masks instead of pointer graphs + mutexes,
- bag-of-words place recognition as a fixed-depth vocabulary-tree argmin
  chain on device,
- distributed bundle adjustment over a `jax.sharding.Mesh` (edge-sharded
  Hessian build, psum-reduced Schur camera system over ICI).

The reference's thread pipeline (Tracking / LocalMapping / LoopClosing,
src/System.cc:94-105) becomes host-orchestrated jitted steps over versioned
array snapshots; there are no mutexes.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry (LM normal equations, triangulation SVD prep) needs true f32
# accumulation: the TPU default of bf16 MXU passes loses tracking
# (verified: ATE 0.27 vs 0.012 on the synthetic benchmark). The hot
# descriptor-distance matmuls are int8 and unaffected by this setting.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the fused pipeline steps are large XLA
# programs; caching compilations across processes cuts minutes of startup.
import os as _os

# The cache directory is keyed by the host's CPU identity: XLA:CPU AOT
# results encode machine features (e.g. avx512/amx variants and XLA's own
# tuning features like +prefer-no-scatter), and the persistent cache does
# NOT include them in its key — loading an executable compiled on a
# different host warns "could lead to execution errors such as SIGILL" and
# has been observed to hang at dispatch. The tag hashes `lscpu` output
# (cpuid-derived — catches hypervisor feature masking that /proc/cpuinfo
# alone missed) plus the jaxlib version, under a schema version so stale
# pre-guard directories are never reused. TPU executables are unaffected
# but live in the same per-host directory for simplicity.
def _host_tag() -> str:
    import hashlib
    import subprocess

    probes = []
    try:
        probes.append(subprocess.run(
            ["lscpu"], capture_output=True, timeout=10).stdout)
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name")):
                    probes.append(line.encode())
                    break
    except OSError:
        pass
    if not probes:
        import platform

        probes.append(platform.processor().encode())
    probes.append(_jax.__version__.encode())
    return "v2-" + hashlib.sha1(b"\n".join(probes)).hexdigest()[:12]


_cache_dir = _os.environ.get(
    "SSPL_COMPILE_CACHE", f"/tmp/sspl_jax_cache_{_host_tag()}"
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # never persist XLA-internal side caches (autotune/kernel files):
    # they are even more host-specific than the AOT executables
    _jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
except Exception:  # pragma: no cover - cache is best-effort
    pass

from structure_slam_pointline_tpu.config import SLAMConfig  # noqa: F401
