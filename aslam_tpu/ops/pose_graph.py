"""Pose-graph optimization over SE(3) — the loop-correction backbone.

The reference *declares* this capability but never finished it
(LoopClosing::ComputeSim3 fully commented out, loopclosing.cpp:95-131; no
pose-graph optimizer anywhere).  SURVEY.md §3.5 directs the new framework
to implement the full loop: candidate -> relative-pose solve -> loop edge
-> pose-graph optimization -> landmark correction.

Design: variables are world-to-camera poses T_i; constraints are relative
measurements M_ij ~= T_i T_j^-1 with scalar weights (covisibility edges
from current estimates + loop edges from RANSAC).  Residual
r_e = log(M_e^-1 T_i T_j^-1); Jacobians come from `jax.jacfwd` of the
left-perturbation — exact, no hand-derived adjoints to get wrong — and the
damped normal equations are assembled with scatter-adds and solved dense
(fine to ~500 KFs; the multi-host CG variant shards edges like
parallel/sharded_ba.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from aslam_tpu.utils.se3 import se3_exp, se3_log, T_inv


class PoseGraph(NamedTuple):
    T: jnp.ndarray          # [K,4,4] poses (T_cw)
    node_valid: jnp.ndarray # [K] bool
    node_fixed: jnp.ndarray # [K] bool (gauge anchors)
    e_i: jnp.ndarray        # [E] int32
    e_j: jnp.ndarray        # [E] int32
    e_meas: jnp.ndarray     # [E,4,4] measured T_i T_j^-1
    e_w: jnp.ndarray        # [E] float32 weight (0 = inactive)


def edge_residual(T_i, T_j, M):
    return se3_log(T_inv(M) @ T_i @ T_inv(T_j))


def _edge_jacobians(T_i, T_j, M):
    """[6,6] Jacobians of the residual w.r.t. left-perturbations of i, j."""

    def r_of(xi_i, xi_j):
        return edge_residual(se3_exp(xi_i) @ T_i, se3_exp(xi_j) @ T_j, M)

    z = jnp.zeros(6)
    Ji = jax.jacfwd(r_of, argnums=0)(z, z)
    Jj = jax.jacfwd(r_of, argnums=1)(z, z)
    return Ji, Jj


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize(pg: PoseGraph, iters: int = 20, lam: float = 1e-6) -> PoseGraph:
    K = pg.T.shape[0]

    def body(_, T):
        T_i = T[pg.e_i]
        T_j = T[pg.e_j]
        r = jax.vmap(edge_residual)(T_i, T_j, pg.e_meas)        # [E,6]
        Ji, Jj = jax.vmap(_edge_jacobians)(T_i, T_j, pg.e_meas) # [E,6,6]

        w = pg.e_w * pg.node_valid[pg.e_i] * pg.node_valid[pg.e_j]
        wJi = w[:, None, None] * Ji
        wJj = w[:, None, None] * Jj

        H = jnp.zeros((K, K, 6, 6))
        H = H.at[pg.e_i, pg.e_i].add(jnp.einsum("eri,erj->eij", wJi, Ji))
        H = H.at[pg.e_j, pg.e_j].add(jnp.einsum("eri,erj->eij", wJj, Jj))
        H = H.at[pg.e_i, pg.e_j].add(jnp.einsum("eri,erj->eij", wJi, Jj))
        H = H.at[pg.e_j, pg.e_i].add(jnp.einsum("eri,erj->eij", wJj, Ji))
        b = jnp.zeros((K, 6))
        b = b.at[pg.e_i].add(jnp.einsum("eri,er->ei", wJi, r))
        b = b.at[pg.e_j].add(jnp.einsum("eri,er->ei", wJj, r))

        Hm = H.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
        rhs = b.reshape(K * 6)
        free = (pg.node_valid & ~pg.node_fixed)
        free6 = jnp.repeat(free, 6)
        Hm = jnp.where(free6[:, None] & free6[None, :], Hm, 0.0)
        Hm = Hm + jnp.diag(jnp.where(free6, lam, 1.0))
        Hm = Hm + jnp.diag(jnp.where(free6, 1e-8 + lam * jnp.abs(jnp.diagonal(Hm)), 0.0))
        rhs = jnp.where(free6, rhs, 0.0)

        dx = -jnp.linalg.solve(Hm, rhs).reshape(K, 6)
        dx = jnp.where(jnp.isfinite(dx) & free[:, None], dx, 0.0)
        return jax.vmap(se3_exp)(dx) @ T

    T = jax.lax.fori_loop(0, iters, body, pg.T)
    return pg._replace(T=T)


def total_error(pg: PoseGraph) -> jnp.ndarray:
    r = jax.vmap(edge_residual)(pg.T[pg.e_i], pg.T[pg.e_j], pg.e_meas)
    w = pg.e_w * pg.node_valid[pg.e_i] * pg.node_valid[pg.e_j]
    return jnp.sum(w * jnp.sum(r * r, axis=-1))
