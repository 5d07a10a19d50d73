"""c_orb_slam_tpu — a TPU-native visual SLAM framework (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of ORB-SLAM2 (reference:
/root/reference, C++/pthreads) as batched, fixed-shape array programs:

- ORB extraction (pyramid + FAST + orientation + rBRIEF) as fused XLA/Pallas
  kernels over whole images (reference: src/ORBextractor.cc).
- Descriptor matching as masked batched Hamming distance (popcount) kernels
  (reference: src/ORBmatcher.cc).
- RANSAC solvers (H/F two-view init, PnP relocalization, Horn Sim3 loop
  alignment) as vmapped hypothesis batches evaluated in one pass
  (reference: src/Initializer.cc, src/PnPsolver.cc, src/Sim3Solver.cc).
- One Gauss-Newton/LM engine with implicit Schur-complement PCG replacing g2o
  (reference: src/Optimizer.cc, Thirdparty/g2o).
- Map state as struct-of-arrays with capacity padding + validity masks instead
  of pointer graphs (reference: src/{Map,KeyFrame,MapPoint}.cc).
- Multi-device scaling via jax.sharding meshes with psum/reduce-scatter
  collectives for distributed bundle adjustment (the reference is
  single-process shared memory; see SURVEY.md §2.3).
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to bfloat16 passes; geometry (pose chains, 3x3
# rotations, Schur blocks) needs full float32 or trajectories drift from
# rounding alone (observed: 3x3 rotation roundtrip error 6e-2 in bf16 vs
# 6e-5 in f32 on a v5e). Hot kernels that *want* bf16 (descriptor score
# matrices, image ops) opt in locally via jax.default_matmul_precision.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the SLAM pipeline is ~dozens of jitted
# fixed-shape programs; on remote-compile TPU tunnels a cold compile of
# the full set dominates wall time. The cache makes every process after
# the first start at full speed (safe on CPU too). Opt out with
# C_ORB_SLAM_TPU_NO_COMP_CACHE=1.
import os as _os

if not _os.environ.get("C_ORB_SLAM_TPU_NO_COMP_CACHE"):
    # One cache per platform: a shared dir poisons local CPU runs with
    # AOT executables compiled on the remote TPU host's different CPU
    # (observed: cpu_aot_loader "machine features don't match" / SIGILL
    # warnings when CPU runs followed axon-tunnel runs).
    _platform = (_os.environ.get("JAX_PLATFORMS") or "default").split(",")[0]
    _cache_dir = _os.environ.get(
        "C_ORB_SLAM_TPU_COMP_CACHE",
        _os.path.expanduser(f"~/.cache/c_orb_slam_tpu_xla_{_platform}"),
    )
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from c_orb_slam_tpu.config import SlamConfig, CameraConfig, OrbConfig  # noqa: F401
