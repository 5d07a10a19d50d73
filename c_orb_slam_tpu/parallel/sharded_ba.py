"""Map-sharded distributed bundle adjustment (keyframe-block scale-out).

This is the scale-out layer the reference cannot express at all (single
process, pthreads, shared-memory map — SURVEY.md §2.3): the MAP itself is
partitioned across devices, not just the observation list
(parallel/dba.py does the latter). Replaces, at multi-device scale, the
dense Schur machinery of g2o's BlockSolver
(Thirdparty/g2o/g2o/core/block_solver.hpp:354-447) that backs
Optimizer::GlobalBundleAdjustemnt (src/Optimizer.cc:49).

Layout (explicit shard_map SPMD, not GSPMD inference):

  * points + their observations: sharded.  Observations are pre-sorted by
    point id and slab-partitioned so that every observation lives on the
    device that owns its point ("points follow their landmarks").  All
    point-side work — Hpp, Hpp⁻¹, gp, back-substitution — is therefore
    purely local: ZERO communication on the (large) point/observation side.
  * camera poses: replicated (they are the small, dense, globally-coupled
    part — exactly the part the reference keeps in every thread's shared
    memory).
  * the reduced camera (Schur) system: SHARDED over camera blocks.  Each
    device accumulates its local contribution to Hcc/gc/Schur-matvec and
    a `psum_scatter` leaves it holding only its own camera-block rows —
    the "reduce-scatter of the camera Schur system" of the SURVEY plan.
    PCG then runs on (C/D, 6) shards: per iteration the collective volume
    is one all_gather(6C) + one psum_scatter(6C) + two scalar psums,
    independent of the observation count — the weak-scaling shape that
    lets observation capacity grow linearly with devices at constant
    communication.

Numerically this computes the SAME two-stage robust LM solve as
optim/ba.bundle_adjust (tests/test_sharded_ba.py asserts shard ≡ single
device); only the partitioning differs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from c_orb_slam_tpu.geometry import se3
from c_orb_slam_tpu.optim import ba
from c_orb_slam_tpu.optim import residuals as res

AXIS = "map"


# ---------------------------------------------------------------------------
# Host-side partitioning: points round-robin into D blocks, observations
# slab-partitioned to follow their point's block.
# ---------------------------------------------------------------------------


def partition_problem(p: ba.BAProblem, n_devices: int) -> ba.BAProblem:
    """Reorder/pad a BAProblem so axis-0 shards align with point ownership.

    Returns a new problem whose `points` axis is padded to a multiple of
    n_devices (block d owns points [d*Ps, (d+1)*Ps)) and whose observation
    arrays are grouped into D equal-size slabs such that slab d only
    references points owned by block d. Cameras are padded to a multiple
    of n_devices so the Schur system can be reduce-scattered over camera
    blocks. All padding slots are masked invalid.
    """
    p = jax.tree.map(np.asarray, p)
    C0 = p.cam_T.shape[0]
    P0 = p.points.shape[0]

    pad_c = (-C0) % n_devices
    pad_p = (-P0) % n_devices
    Pn = P0 + pad_p

    cam_T = np.concatenate(
        [p.cam_T, np.tile(np.eye(3, 4, dtype=p.cam_T.dtype), (pad_c, 1, 1))]
    )
    cam_fixed = np.concatenate([p.cam_fixed, np.ones(pad_c, bool)])
    cam_valid = np.concatenate([p.cam_valid, np.zeros(pad_c, bool)])
    points = np.concatenate([p.points, np.zeros((pad_p, 3), p.points.dtype)])
    point_valid = np.concatenate([p.point_valid, np.zeros(pad_p, bool)])

    # Keep point ids in place (block = contiguous range) — callers index
    # results by the original ids.
    Ps = Pn // n_devices
    owner = np.asarray(p.obs_pt) // Ps  # (O,) device owning each obs

    # Group observations by owner; pad every slab to the max slab length.
    order = np.argsort(owner, kind="stable")
    counts = np.bincount(owner, minlength=n_devices)
    slab = int(counts.max()) if counts.size else 1
    slab = max(slab, 1)
    O_new = slab * n_devices

    def gather_pad(x, fill=0):
        out = np.full((O_new,) + x.shape[1:], fill, x.dtype)
        off = 0
        for d in range(n_devices):
            sel = order[off : off + counts[d]]
            out[d * slab : d * slab + counts[d]] = x[sel]
            off += counts[d]
        return out

    obs_valid = gather_pad(np.asarray(p.obs_valid), False)
    # Padding obs point at the owning block's first point, camera 0 —
    # in-range indices, masked out by obs_valid=False.
    obs_pt = gather_pad(np.asarray(p.obs_pt))
    obs_cam = gather_pad(np.asarray(p.obs_cam))
    for d in range(n_devices):
        lo, hi = d * slab + counts[d], (d + 1) * slab
        obs_pt[lo:hi] = d * Ps
        obs_cam[lo:hi] = 0

    return ba.BAProblem(
        cam_T=cam_T,
        cam_fixed=cam_fixed,
        cam_valid=cam_valid,
        points=points,
        point_valid=point_valid,
        obs_cam=obs_cam,
        obs_pt=obs_pt,
        obs_uv=gather_pad(np.asarray(p.obs_uv)),
        obs_stereo=gather_pad(np.asarray(p.obs_stereo), False),
        obs_inv_sigma2=gather_pad(np.asarray(p.obs_inv_sigma2), 1),
        obs_valid=obs_valid,
        K=p.K,
        bf=p.bf,
    )


# ---------------------------------------------------------------------------
# Device-local SPMD body. Every array argument named *_l is this device's
# shard; cam_T/cam_fixed/cam_valid are replicated full copies.
# ---------------------------------------------------------------------------


def _local_terms(pl, cam_T, points_l, use_huber, chi2_mono, chi2_stereo):
    """Per-observation residuals/Jacobians on the local slab. obs_pt_l is
    LOCAL (0..P_loc) — point gathers never leave the device."""
    T = cam_T[pl["obs_cam"]]
    xw = points_l[pl["obs_pt_l"]]
    r, Jc, Jp = res.residual_and_jacobians(
        T, xw, pl["obs_uv"], pl["K"], pl["bf"], pl["obs_stereo"]
    )
    c2 = res.chi2(r, pl["obs_inv_sigma2"])
    chi2_th = jnp.where(pl["obs_stereo"], chi2_stereo, chi2_mono)
    w = pl["obs_inv_sigma2"] * pl["obs_valid"].astype(r.dtype)
    if use_huber:
        w = w * res.huber_weight(c2, chi2_th)
    z = se3.apply(T, xw)[..., 2]
    w = w * (z > 1e-3).astype(r.dtype)
    Jc = Jc * (1.0 - pl["cam_fixed"][pl["obs_cam"]].astype(r.dtype))[:, None, None]
    return r, Jc, Jp, w, c2


def _cam_scatter(obs_cam, blocks, C):
    """Local one-hot-matmul accumulation (O_loc, B) -> full (C, B) partial."""
    oh = jax.nn.one_hot(obs_cam, C, dtype=blocks.dtype)
    return jnp.dot(oh.T, blocks, preferred_element_type=blocks.dtype)


def _ba_iteration_spmd(pl, cam_T, points_l, lm_lambda, use_huber,
                       chi2_mono, chi2_stereo, pcg_iters):
    """One damped GN step, camera Schur system sharded over camera blocks."""
    C = cam_T.shape[0]
    P_loc = points_l.shape[0]
    r, Jc, Jp, w, _ = _local_terms(
        pl, cam_T, points_l, use_huber, chi2_mono, chi2_stereo
    )

    # --- camera side: local partial -> reduce-scatter to (C/D, ...) ---
    cam_blocks = jnp.concatenate(
        [
            jnp.einsum("nij,nik,n->njk", Jc, Jc, w).reshape(-1, 36),
            jnp.einsum("nij,ni,n->nj", Jc, r, w),
        ],
        axis=1,
    )
    cam_acc = lax.psum_scatter(
        _cam_scatter(pl["obs_cam"], cam_blocks, C), AXIS, scatter_dimension=0,
        tiled=True,
    )  # (C/D, 42)
    Hcc_s = cam_acc[:, :36].reshape(-1, 6, 6)
    gc_s = cam_acc[:, 36:]

    # --- point side: purely local ---
    pt_blocks = jnp.concatenate(
        [
            jnp.einsum("nij,nik,n->njk", Jp, Jp, w).reshape(-1, 9),
            jnp.einsum("nij,ni,n->nj", Jp, r, w),
        ],
        axis=1,
    )
    pt_acc = jax.ops.segment_sum(
        pt_blocks, pl["obs_pt_l"], num_segments=P_loc, indices_are_sorted=True
    )
    Hpp = pt_acc[:, :9].reshape(P_loc, 3, 3)
    gp = pt_acc[:, 9:]

    free_cam = (pl["cam_valid"] & ~pl["cam_fixed"]).astype(r.dtype)  # (C,)
    d_idx = lax.axis_index(AXIS)
    Cs = C // lax.axis_size(AXIS)
    free_s = lax.dynamic_slice_in_dim(free_cam, d_idx * Cs, Cs)  # (C/D,)

    eye6 = jnp.eye(6, dtype=r.dtype)
    eye3 = jnp.eye(3, dtype=r.dtype)
    Hcc_s = Hcc_s + lm_lambda * eye6 + (1.0 - free_s)[:, None, None] * eye6
    live_pt = pl["point_valid_l"].astype(r.dtype)[:, None, None]
    Hpp = Hpp + lm_lambda * eye3 + (1.0 - live_pt) * eye3
    Hpp_inv = ba._inv3x3(Hpp)

    def schur_matvec(x_s):
        """S @ x with x sharded (C/D, 6).
        Collectives: all_gather(6C) + psum_scatter(6C)."""
        x_s = x_s * free_s[:, None]
        x = lax.all_gather(x_s, AXIS, tiled=True)  # (C, 6)
        hx_s = jnp.einsum("cij,cj->ci", Hcc_s, x_s)
        u = jnp.einsum("nij,nj->ni", Jc, x[pl["obs_cam"]]) * w[:, None]
        v = jax.ops.segment_sum(
            jnp.einsum("nij,ni->nj", Jp, u), pl["obs_pt_l"],
            num_segments=P_loc, indices_are_sorted=True,
        )
        y = jnp.einsum("pij,pj->pi", Hpp_inv, v)
        s = jnp.einsum("nij,nj->ni", Jp, y[pl["obs_pt_l"]]) * w[:, None]
        z_part = _cam_scatter(pl["obs_cam"], jnp.einsum("nij,ni->nj", Jc, s), C)
        z_s = lax.psum_scatter(z_part, AXIS, scatter_dimension=0, tiled=True)
        return (hx_s - z_s) * free_s[:, None]

    # Schur RHS: -(gc - W Hpp^{-1} gp), sharded.
    y = jnp.einsum("pij,pj->pi", Hpp_inv, gp)
    s = jnp.einsum("nij,nj->ni", Jp, y[pl["obs_pt_l"]]) * w[:, None]
    Wy_part = _cam_scatter(pl["obs_cam"], jnp.einsum("nij,ni->nj", Jc, s), C)
    Wy_s = lax.psum_scatter(Wy_part, AXIS, scatter_dimension=0, tiled=True)
    rhs_s = -(gc_s - Wy_s) * free_s[:, None]

    Hcc_inv_s = jnp.linalg.inv(Hcc_s)

    def precond(x_s):
        return jnp.einsum("cij,cj->ci", Hcc_inv_s, x_s) * free_s[:, None]

    def pdot(a, b):
        return lax.psum(jnp.sum(a * b), AXIS)

    # PCG on sharded camera vectors.
    x_s = jnp.zeros_like(rhs_s)
    r_s = rhs_s
    z_s = precond(r_s)
    d_s = z_s
    rz = pdot(r_s, z_s)

    def pcg_body(state, _):
        x_s, r_s, d_s, rz = state
        Ad = schur_matvec(d_s)
        alpha = rz / jnp.maximum(pdot(d_s, Ad), 1e-20)
        x_s = x_s + alpha * d_s
        r_s = r_s - alpha * Ad
        z_s = precond(r_s)
        rz_new = pdot(r_s, z_s)
        beta = rz_new / jnp.maximum(rz, 1e-20)
        d_s = z_s + beta * d_s
        return (x_s, r_s, d_s, rz_new), None

    (dc_s, _, _, _), _ = lax.scan(
        pcg_body, (x_s, r_s, d_s, rz), None, length=pcg_iters
    )
    dc = lax.all_gather(dc_s * free_s[:, None], AXIS, tiled=True)  # (C, 6)

    # Back-substitute point updates: purely local.
    u = jnp.einsum("nij,nj->ni", Jc, dc[pl["obs_cam"]]) * w[:, None]
    Wt_dc = jax.ops.segment_sum(
        jnp.einsum("nij,ni->nj", Jp, u), pl["obs_pt_l"], num_segments=P_loc,
        indices_are_sorted=True,
    )
    dp = jnp.einsum("pij,pj->pi", Hpp_inv, -gp - Wt_dc)
    dp = dp * pl["point_valid_l"].astype(dp.dtype)[:, None]

    new_T = jax.vmap(lambda d, T: se3.compose(se3.exp(d), T))(dc, cam_T)
    new_T = jnp.where(free_cam[:, None, None] > 0, new_T, cam_T)
    return new_T, points_l + dp


def _total_error_spmd(pl, cam_T, points_l, use_huber, chi2_mono, chi2_stereo):
    r, _, _, w, c2 = _local_terms(
        pl, cam_T, points_l, use_huber, chi2_mono, chi2_stereo
    )
    chi2_th = jnp.where(pl["obs_stereo"], chi2_stereo, chi2_mono)
    mask = pl["obs_valid"].astype(r.dtype)
    robust = jnp.where(
        c2 <= chi2_th,
        c2,
        2.0 * jnp.sqrt(chi2_th) * jnp.sqrt(jnp.maximum(c2, 1e-12)) - chi2_th,
    )
    return lax.psum(jnp.sum((robust if use_huber else c2) * mask), AXIS)


def _classify_spmd(pl, cam_T, points_l, chi2_mono, chi2_stereo):
    T = cam_T[pl["obs_cam"]]
    xw = points_l[pl["obs_pt_l"]]
    r, _, _ = res.residual_and_jacobians(
        T, xw, pl["obs_uv"], pl["K"], pl["bf"], pl["obs_stereo"]
    )
    c2 = res.chi2(r, pl["obs_inv_sigma2"])
    chi2_th = jnp.where(pl["obs_stereo"], chi2_stereo, chi2_mono)
    z = se3.apply(T, xw)[..., 2]
    return pl["obs_valid"] & (c2 <= chi2_th) & (z > 0)


def _optimize_spmd(pl, cam_T, points_l, iters, use_huber, chi2_mono,
                   chi2_stereo, pcg_iters, lm_lambda0):
    """LM loop with accept/reject damping — sharded twin of ba.optimize."""

    def body(state, _):
        cam_T, points_l, lam, err = state
        new_T, new_pts = _ba_iteration_spmd(
            pl, cam_T, points_l, lam, use_huber, chi2_mono, chi2_stereo,
            pcg_iters,
        )
        new_err = _total_error_spmd(
            pl, new_T, new_pts, use_huber, chi2_mono, chi2_stereo
        )
        accept = new_err < err
        cam_T = jnp.where(accept, new_T, cam_T)
        points_l = jnp.where(accept, new_pts, points_l)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        err = jnp.where(accept, new_err, err)
        return (cam_T, points_l, lam, err), None

    err0 = _total_error_spmd(
        pl, cam_T, points_l, use_huber, chi2_mono, chi2_stereo
    )
    (cam_T, points_l, _, _), _ = lax.scan(
        body, (cam_T, points_l, jnp.asarray(lm_lambda0, jnp.float32), err0),
        None, length=iters,
    )
    return cam_T, points_l


def _ba_spmd_body(cam_T, cam_fixed, cam_valid, points_l, point_valid_l,
                  obs_cam, obs_pt, obs_uv, obs_stereo, obs_inv_sigma2,
                  obs_valid, K, bf, *, iters_first, iters_second, pcg_iters,
                  chi2_mono, chi2_stereo):
    """shard_map body: two-stage robust BA (mirrors ba.bundle_adjust)."""
    P_loc = points_l.shape[0]
    d_idx = lax.axis_index(AXIS)
    # Localize point ids: block d owns [d*P_loc, (d+1)*P_loc).
    obs_pt_l = obs_pt - d_idx * P_loc
    # Sort the local slab by point id so segment sums take the sorted path.
    order = jnp.argsort(obs_pt_l)
    pl = dict(
        cam_fixed=cam_fixed, cam_valid=cam_valid,
        point_valid_l=point_valid_l,
        obs_cam=obs_cam[order], obs_pt_l=obs_pt_l[order],
        obs_uv=obs_uv[order], obs_stereo=obs_stereo[order],
        obs_inv_sigma2=obs_inv_sigma2[order], obs_valid=obs_valid[order],
        K=K, bf=bf,
    )

    cam_T, points_l = _optimize_spmd(
        pl, cam_T, points_l, iters_first, True, chi2_mono, chi2_stereo,
        pcg_iters, 1e-4,
    )
    inlier = _classify_spmd(pl, cam_T, points_l, chi2_mono, chi2_stereo)
    pl2 = dict(pl, obs_valid=inlier)
    cam_T, points_l = _optimize_spmd(
        pl2, cam_T, points_l, iters_second, False, chi2_mono, chi2_stereo,
        pcg_iters, 1e-4,
    )
    inlier = _classify_spmd(pl2, cam_T, points_l, chi2_mono, chi2_stereo)

    # Mean inlier chi2 (sorted order — a pure reduction, order-free).
    T = cam_T[pl2["obs_cam"]]
    r, _, _ = res.residual_and_jacobians(
        T, points_l[pl2["obs_pt_l"]], pl2["obs_uv"], K, bf, pl2["obs_stereo"]
    )
    c2 = res.chi2(r, pl2["obs_inv_sigma2"])
    n = lax.psum(jnp.sum(inlier.astype(jnp.float32)), AXIS)
    mean_chi2 = lax.psum(
        jnp.sum(jnp.where(inlier, c2, 0.0)), AXIS
    ) / jnp.maximum(n, 1.0)

    # Un-sort the inlier mask back to slab order for the caller.
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    inlier = inlier[inv]
    return cam_T, points_l, inlier, mean_chi2


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "iters_first", "iters_second", "pcg_iters",
                     "chi2_mono", "chi2_stereo"),
)
def _run(pp: ba.BAProblem, mesh: Mesh, iters_first, iters_second, pcg_iters,
         chi2_mono, chi2_stereo):
    sh = functools.partial(
        _ba_spmd_body,
        iters_first=iters_first, iters_second=iters_second,
        pcg_iters=pcg_iters, chi2_mono=chi2_mono, chi2_stereo=chi2_stereo,
    )
    rep = P()
    shd = P(AXIS)
    fn = jax.shard_map(
        sh,
        mesh=mesh,
        in_specs=(rep, rep, rep, shd, shd, shd, shd, shd, shd, shd, shd,
                  rep, rep),
        out_specs=(rep, shd, shd, rep),
        check_vma=False,
    )
    return fn(
        pp.cam_T, pp.cam_fixed, pp.cam_valid, pp.points, pp.point_valid,
        pp.obs_cam, pp.obs_pt, pp.obs_uv, pp.obs_stereo, pp.obs_inv_sigma2,
        pp.obs_valid, pp.K, jnp.asarray(pp.bf, jnp.float32),
    )


def lower_solve(pp: ba.BAProblem, mesh: Mesh, iters_first, iters_second,
                pcg_iters, chi2_mono: float = 5.991,
                chi2_stereo: float = 7.815):
    """jax.jit-lowered (unexecuted) solve on an already-partitioned
    problem — lets tools inspect the compiled HLO (collective accounting
    in tools/weak_scaling.py) without running it."""
    sh = functools.partial(
        _ba_spmd_body,
        iters_first=iters_first, iters_second=iters_second,
        pcg_iters=pcg_iters, chi2_mono=chi2_mono, chi2_stereo=chi2_stereo,
    )
    rep = P()
    shd = P(AXIS)
    fn = jax.shard_map(
        sh,
        mesh=mesh,
        in_specs=(rep, rep, rep, shd, shd, shd, shd, shd, shd, shd, shd,
                  rep, rep),
        out_specs=(rep, shd, shd, rep),
        check_vma=False,
    )
    return jax.jit(fn).lower(
        pp.cam_T, pp.cam_fixed, pp.cam_valid, pp.points, pp.point_valid,
        pp.obs_cam, pp.obs_pt, pp.obs_uv, pp.obs_stereo, pp.obs_inv_sigma2,
        pp.obs_valid, pp.K, jnp.asarray(pp.bf, jnp.float32),
    )


def sharded_bundle_adjust(
    p: ba.BAProblem,
    mesh: Mesh | None = None,
    iters_first: int = 5,
    iters_second: int = 10,
    pcg_iters: int = 40,
    chi2_mono: float = 5.991,
    chi2_stereo: float = 7.815,
):
    """Two-stage robust BA with the map sharded over `mesh`.

    Returns (cam_T (C',3,4), points (P',3), obs_inlier (O',), mean_chi2)
    on the PARTITIONED problem returned alongside:
    `(result, partitioned_problem)`. Point ids are preserved (padding only
    appended), so `points[:P0]` lines up with the input problem.
    """
    mesh = mesh if mesh is not None else make_mesh()
    n = mesh.devices.size
    pp = partition_problem(p, n)
    pp = jax.tree.map(jnp.asarray, pp)
    cam_T, points, inlier, mean_chi2 = _run(
        pp, mesh, iters_first, iters_second, pcg_iters, chi2_mono,
        chi2_stereo,
    )
    return (cam_T, points, inlier, mean_chi2), pp
