"""Distributed Sim(3) pose-graph optimization: edge axis sharded.

Scale-out twin of optim/pose_graph.py (which replaces the reference's
Optimizer::OptimizeEssentialGraph, src/Optimizer.cc:781-1044). For a
city-scale essential graph the edge set dominates (covisibility edges
grow superlinearly in keyframes); here each device owns an edge shard
and the small vertex state (K, 7 tangent / K, 8 Sim3) stays replicated:

  * residuals/Jacobians: local per edge shard — zero communication;
  * gradient, block-diagonal preconditioner, and every PCG matvec:
    local scatter-add partials followed by one `psum` of a (K, 7)
    vector — per-iteration collective volume O(K), independent of E.

Same GN/PCG math as optimize_pose_graph; tests assert shard ≡ single.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from c_orb_slam_tpu.geometry import sim3
from c_orb_slam_tpu.optim.pose_graph import PoseGraphProblem, _edge_residual

AXIS = "edges"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def pad_edges(p: PoseGraphProblem, multiple: int) -> PoseGraphProblem:
    """Pad the edge axis so it divides the device count (weight-0,
    valid=False self-loops at vertex 0)."""
    E = p.edge_i.shape[0]
    pad = (-E) % multiple
    if pad == 0:
        return p
    ident = jnp.tile(jnp.asarray(sim3.identity()), (pad, 1))
    z = jnp.zeros(pad, jnp.int32)
    return p._replace(
        edge_i=jnp.concatenate([p.edge_i, z]),
        edge_j=jnp.concatenate([p.edge_j, z]),
        edge_Sji=jnp.concatenate([p.edge_Sji, ident]),
        edge_weight=jnp.concatenate([p.edge_weight, jnp.zeros(pad)]),
        edge_valid=jnp.concatenate([p.edge_valid, jnp.zeros(pad, bool)]),
    )


def _body(vertices, v_fixed, v_valid, edge_i, edge_j, edge_Sji, edge_weight,
          edge_valid, *, iters, pcg_iters, fix_scale):
    """shard_map body: edge arrays are local shards, vertices replicated."""
    K = vertices.shape[0]
    zero = jnp.zeros(7, jnp.float32)
    free = (v_valid & ~v_fixed).astype(jnp.float32)[:, None]
    scale_mask = jnp.ones(7, jnp.float32)
    if fix_scale:
        scale_mask = scale_mask.at[6].set(0.0)

    def gn_iter(verts, _):
        S_i = verts[edge_i]
        S_j = verts[edge_j]
        r = jax.vmap(_edge_residual, in_axes=(None, None, 0, 0, 0))(
            zero, zero, S_i, S_j, edge_Sji
        )
        Ji = jax.vmap(
            jax.jacrev(_edge_residual, argnums=0), in_axes=(None, None, 0, 0, 0)
        )(zero, zero, S_i, S_j, edge_Sji)
        Jj = jax.vmap(
            jax.jacrev(_edge_residual, argnums=1), in_axes=(None, None, 0, 0, 0)
        )(zero, zero, S_i, S_j, edge_Sji)
        w = (edge_weight * edge_valid).astype(jnp.float32)

        gi = -jnp.einsum("eab,ea,e->eb", Ji, r, w)
        gj = -jnp.einsum("eab,ea,e->eb", Jj, r, w)
        g = jnp.zeros((K, 7), jnp.float32)
        g = g.at[edge_i].add(gi).at[edge_j].add(gj)
        g = lax.psum(g, AXIS) * free * scale_mask

        Hii = jnp.einsum("eab,eac,e->ebc", Ji, Ji, w)
        Hjj = jnp.einsum("eab,eac,e->ebc", Jj, Jj, w)
        Hdiag = jnp.zeros((K, 7, 7), jnp.float32)
        Hdiag = Hdiag.at[edge_i].add(Hii).at[edge_j].add(Hjj)
        Hdiag = lax.psum(Hdiag, AXIS) + 1e-5 * jnp.eye(7)
        Hdiag_inv = jnp.linalg.inv(Hdiag)

        def matvec(x):
            x = x * free * scale_mask
            y = jnp.einsum("eab,eb->ea", Ji, x[edge_i]) + jnp.einsum(
                "eab,eb->ea", Jj, x[edge_j]
            )
            y = y * w[:, None]
            out = jnp.zeros((K, 7), jnp.float32)
            out = out.at[edge_i].add(jnp.einsum("eab,ea->eb", Ji, y))
            out = out.at[edge_j].add(jnp.einsum("eab,ea->eb", Jj, y))
            out = lax.psum(out, AXIS) + 1e-5 * x
            return out * free * scale_mask

        def precond(x):
            return jnp.einsum("kab,kb->ka", Hdiag_inv, x) * free * scale_mask

        x = jnp.zeros((K, 7), jnp.float32)
        rr = g - matvec(x)
        z = precond(rr)
        d = z
        rz = jnp.sum(rr * z)

        def pcg_body(state, _):
            x, rr, d, rz = state
            Hd = matvec(d)
            alpha = rz / jnp.maximum(jnp.sum(d * Hd), 1e-20)
            x = x + alpha * d
            rr = rr - alpha * Hd
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            d = z + beta * d
            return (x, rr, d, rz_new), None

        (x, _, _, _), _ = lax.scan(pcg_body, (x, rr, d, rz), None, length=pcg_iters)
        dx = x * free * scale_mask
        verts_new = jax.vmap(lambda xi, S: sim3.compose(sim3.exp(xi), S))(dx, verts)
        keep = (v_valid & ~v_fixed)[:, None]
        return jnp.where(keep, verts_new, verts), None

    verts, _ = lax.scan(gn_iter, vertices, None, length=iters)
    return verts


@functools.partial(
    jax.jit, static_argnames=("mesh", "iters", "pcg_iters", "fix_scale")
)
def _run(p: PoseGraphProblem, mesh, iters, pcg_iters, fix_scale):
    fn = jax.shard_map(
        functools.partial(
            _body, iters=iters, pcg_iters=pcg_iters, fix_scale=fix_scale
        ),
        mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(
        p.vertices, p.v_fixed, p.v_valid, p.edge_i, p.edge_j, p.edge_Sji,
        p.edge_weight, p.edge_valid,
    )


def distributed_pose_graph(
    p: PoseGraphProblem,
    mesh: Mesh | None = None,
    iters: int = 20,
    pcg_iters: int = 50,
    fix_scale: bool = False,
) -> jnp.ndarray:
    """Edge-sharded essential-graph solve. Returns optimized (K, 8) Sim3."""
    mesh = mesh if mesh is not None else make_mesh()
    p = pad_edges(p, mesh.devices.size)
    return _run(p, mesh, iters, pcg_iters, fix_scale)
