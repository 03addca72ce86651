"""Pose-graph optimization: batched Gauss-Newton on SE(3).

New capability (SURVEY.md §7 M4; BASELINE config 4 "keyframe SLAM with
pose-graph optimization").  Fixed-shape edge table (i, j, measurement,
weight, valid), autodiff edge Jacobians vmapped over edges, dense damped
normal equations (6N x 6N — keyframe graphs are small; the landmark side
lives in BA), fixed-iteration scan.  Gauge fixed by node mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32

from .se3 import se3_compose, se3_exp, se3_inverse, se3_log


class PoseGraph(NamedTuple):
    """poses: (N, 3, 4) world->cam.  Edges: measurement Z_e ≈ T_i T_j^-1
    (relative pose of node j expressed in node i), with scalar information
    weight; ``edge_valid`` masks unused capacity; ``node_fixed`` pins gauge."""

    poses: jnp.ndarray        # (N, 3, 4)
    edge_i: jnp.ndarray       # (E,) int32
    edge_j: jnp.ndarray       # (E,) int32
    edge_T: jnp.ndarray       # (E, 3, 4) measured T_i T_j^-1
    edge_weight: jnp.ndarray  # (E,) float32
    edge_valid: jnp.ndarray   # (E,) bool
    node_fixed: jnp.ndarray   # (N,) bool


@f32
def edge_residual(Ti: jnp.ndarray, Tj: jnp.ndarray, Z: jnp.ndarray) -> jnp.ndarray:
    """(6,) tangent residual log(Z^-1 T_i T_j^-1)."""
    return se3_log(se3_compose(se3_inverse(Z), se3_compose(Ti, se3_inverse(Tj))))


@f32
def graph_cost(graph: PoseGraph) -> jnp.ndarray:
    r = jax.vmap(edge_residual)(
        graph.poses[graph.edge_i], graph.poses[graph.edge_j], graph.edge_T
    )
    w = graph.edge_weight * graph.edge_valid.astype(jnp.float32)
    return jnp.sum(w * jnp.sum(r * r, axis=-1))


def _edge_linearization(graph: PoseGraph):
    """Residuals (E, 6) and Jacobians (E, 6, 6) wrt left tangents of i, j."""
    Ti = graph.poses[graph.edge_i]
    Tj = graph.poses[graph.edge_j]
    Z = graph.edge_T

    def r_of(xi_i, xi_j, Ti, Tj, Z):
        return edge_residual(
            se3_compose(se3_exp(xi_i), Ti),
            se3_compose(se3_exp(xi_j), Tj),
            Z,
        )

    zero = jnp.zeros((6,), graph.poses.dtype)
    r = jax.vmap(lambda a, b, c: r_of(zero, zero, a, b, c))(Ti, Tj, Z)
    Ji = jax.vmap(
        lambda a, b, c: jax.jacfwd(r_of, argnums=0)(zero, zero, a, b, c)
    )(Ti, Tj, Z)
    Jj = jax.vmap(
        lambda a, b, c: jax.jacfwd(r_of, argnums=1)(zero, zero, a, b, c)
    )(Ti, Tj, Z)
    return r, Ji, Jj


class PGOStats(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    costs: jnp.ndarray


@f32
def optimize_pose_graph(
    graph: PoseGraph,
    iterations: int = 10,
    damping: float = 1e-6,
) -> tuple[PoseGraph, PGOStats]:
    """Damped Gauss-Newton with branchless accept/reject (LM-style)."""
    N = graph.poses.shape[0]
    init_cost = graph_cost(graph)

    def solve(poses, lam):
        g = graph._replace(poses=poses)
        r, Ji, Jj = _edge_linearization(g)
        w = (graph.edge_weight * graph.edge_valid.astype(jnp.float32))[:, None, None]
        Hii = jnp.einsum("eki,ekj->eij", Ji, Ji) * w
        Hjj = jnp.einsum("eki,ekj->eij", Jj, Jj) * w
        Hij = jnp.einsum("eki,ekj->eij", Ji, Jj) * w
        bi = -jnp.einsum("eki,ek->ei", Ji, r) * w[..., 0]
        bj = -jnp.einsum("eki,ek->ei", Jj, r) * w[..., 0]

        H = jnp.zeros((N, N, 6, 6), poses.dtype)
        H = H.at[graph.edge_i, graph.edge_i].add(Hii)
        H = H.at[graph.edge_j, graph.edge_j].add(Hjj)
        H = H.at[graph.edge_i, graph.edge_j].add(Hij)
        H = H.at[graph.edge_j, graph.edge_i].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((N, 6), poses.dtype)
        b = b.at[graph.edge_i].add(bi)
        b = b.at[graph.edge_j].add(bj)

        Hd = jnp.transpose(H, (0, 2, 1, 3)).reshape(6 * N, 6 * N)
        Hd = Hd + (lam + 1e-8) * jnp.eye(6 * N, dtype=poses.dtype)
        rhs = b.reshape(6 * N)
        free = (~graph.node_fixed).astype(poses.dtype)
        fm = jnp.repeat(free, 6)
        Hd = Hd * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
        rhs = rhs * fm
        dxi = jnp.linalg.solve(Hd, rhs).reshape(N, 6)
        return se3_compose(se3_exp(dxi * free[:, None]), poses)

    def body(carry, _):
        poses, lam, cost = carry
        cand = solve(poses, lam)
        new_cost = graph_cost(graph._replace(poses=cand))
        accept = new_cost < cost
        poses = jnp.where(accept, cand, poses)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e6)
        return (poses, lam, cost), cost

    (poses, _, cost), costs = jax.lax.scan(
        body,
        (graph.poses, jnp.float32(damping), init_cost),
        None,
        length=iterations,
    )
    return graph._replace(poses=poses), PGOStats(
        initial_cost=init_cost, final_cost=cost, costs=costs
    )


# ---------------------------------------------------------------------------
# Sim(3) pose graph — scale-drift-aware monocular loop closure
# (Strasdat et al. RSS 2010; the ORB-SLAM loop-closing formulation).
# An SE(3) graph cannot absorb monocular scale drift: the loop-closure
# constraint carries a relative SCALE as well as a relative pose, and only
# a 7-DoF state per node lets the optimizer distribute it around the loop.
# ---------------------------------------------------------------------------

from .sim3 import (  # noqa: E402
    sim3_compose,
    sim3_error,
    sim3_inverse,
    sim3_retract,
)


class Sim3Graph(NamedTuple):
    """Nodes: sim3 world->cam (scale (N,), T (N, 3, 4)).  Edge e measures
    Z_e = S_i o S_j^-1 with relative scale ``edge_s`` (1.0 for odometry;
    the map-alignment scale for loop edges)."""

    scale: jnp.ndarray        # (N,)
    poses: jnp.ndarray        # (N, 3, 4)
    edge_i: jnp.ndarray       # (E,) int32
    edge_j: jnp.ndarray       # (E,) int32
    edge_s: jnp.ndarray       # (E,) measured relative scale
    edge_T: jnp.ndarray       # (E, 3, 4) measured relative pose
    edge_weight: jnp.ndarray  # (E,)
    edge_valid: jnp.ndarray   # (E,) bool
    node_fixed: jnp.ndarray   # (N,) bool


@f32
def sim3_edge_residual(si, Ti, sj, Tj, zs, zT) -> jnp.ndarray:
    """(7,) residual err(Z^-1 S_i S_j^-1)."""
    s_ij, T_ij = sim3_compose(si, Ti, *sim3_inverse(sj, Tj))
    zs_inv, zT_inv = sim3_inverse(zs, zT)
    return sim3_error(*sim3_compose(zs_inv, zT_inv, s_ij, T_ij))


@f32
def sim3_graph_cost(
    graph: Sim3Graph, huber_delta: float | None = None
) -> jnp.ndarray:
    """Weighted residual cost; with ``huber_delta`` each edge's squared
    residual norm is Huber-truncated (rho^2 below delta, linear above),
    so a single wrong loop edge contributes a bounded pull instead of a
    quadratic one."""
    r = jax.vmap(sim3_edge_residual)(
        graph.scale[graph.edge_i], graph.poses[graph.edge_i],
        graph.scale[graph.edge_j], graph.poses[graph.edge_j],
        graph.edge_s, graph.edge_T,
    )
    w = graph.edge_weight * graph.edge_valid.astype(jnp.float32)
    rho2 = jnp.sum(r * r, axis=-1)
    if huber_delta is not None:
        rho = jnp.sqrt(jnp.maximum(rho2, 1e-24))
        d = jnp.float32(huber_delta)
        rho2 = jnp.where(rho <= d, rho2, 2.0 * d * rho - d * d)
    return jnp.sum(w * rho2)


def _huber_irls_weights(r: jnp.ndarray, huber_delta) -> jnp.ndarray:
    """(E,) IRLS weights min(1, delta / ||r||) for the Huber kernel."""
    rho = jnp.sqrt(jnp.maximum(jnp.sum(r * r, axis=-1), 1e-24))
    return jnp.minimum(1.0, jnp.float32(huber_delta) / rho)


@f32
def optimize_pose_graph_sim3(
    graph: Sim3Graph,
    iterations: int = 12,
    damping: float = 1e-6,
    huber_delta: float | None = None,
) -> tuple[Sim3Graph, PGOStats]:
    """Damped Gauss-Newton over 7-DoF nodes, branchless accept/reject.

    Same structure as :func:`optimize_pose_graph` (autodiff edge
    Jacobians vmapped over the fixed-shape edge table, dense 7N x 7N
    normal equations, fixed-iteration scan) with the node state extended
    by log-scale.  ``huber_delta`` enables IRLS Huber robustness: each
    edge's weight is scaled by min(1, delta/||r||) at every outer
    iteration and the accept/reject cost uses the matching robust
    kernel, bounding any single wrong loop edge's influence."""
    N = graph.poses.shape[0]
    init_cost = sim3_graph_cost(graph, huber_delta)

    def r_of(xi_i, xi_j, si, Ti, sj, Tj, zs, zT):
        return sim3_edge_residual(
            *sim3_retract(xi_i, si, Ti), *sim3_retract(xi_j, sj, Tj), zs, zT
        )

    def solve(scale, poses, lam):
        Si, Ti = scale[graph.edge_i], poses[graph.edge_i]
        Sj, Tj = scale[graph.edge_j], poses[graph.edge_j]
        zero = jnp.zeros((7,), poses.dtype)
        args = (Si, Ti, Sj, Tj, graph.edge_s, graph.edge_T)
        r = jax.vmap(lambda *a: r_of(zero, zero, *a))(*args)
        Ji = jax.vmap(
            lambda *a: jax.jacfwd(r_of, argnums=0)(zero, zero, *a)
        )(*args)
        Jj = jax.vmap(
            lambda *a: jax.jacfwd(r_of, argnums=1)(zero, zero, *a)
        )(*args)
        w = graph.edge_weight * graph.edge_valid.astype(jnp.float32)
        if huber_delta is not None:
            w = w * _huber_irls_weights(r, huber_delta)
        w = w[:, None, None]
        Hii = jnp.einsum("eki,ekj->eij", Ji, Ji) * w
        Hjj = jnp.einsum("eki,ekj->eij", Jj, Jj) * w
        Hij = jnp.einsum("eki,ekj->eij", Ji, Jj) * w
        bi = -jnp.einsum("eki,ek->ei", Ji, r) * w[..., 0]
        bj = -jnp.einsum("eki,ek->ei", Jj, r) * w[..., 0]

        H = jnp.zeros((N, N, 7, 7), poses.dtype)
        H = H.at[graph.edge_i, graph.edge_i].add(Hii)
        H = H.at[graph.edge_j, graph.edge_j].add(Hjj)
        H = H.at[graph.edge_i, graph.edge_j].add(Hij)
        H = H.at[graph.edge_j, graph.edge_i].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((N, 7), poses.dtype)
        b = b.at[graph.edge_i].add(bi)
        b = b.at[graph.edge_j].add(bj)

        Hd = jnp.transpose(H, (0, 2, 1, 3)).reshape(7 * N, 7 * N)
        Hd = Hd + (lam + 1e-8) * jnp.eye(7 * N, dtype=poses.dtype)
        rhs = b.reshape(7 * N)
        free = (~graph.node_fixed).astype(poses.dtype)
        fm = jnp.repeat(free, 7)
        Hd = Hd * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
        rhs = rhs * fm
        dxi = jnp.linalg.solve(Hd, rhs).reshape(N, 7) * free[:, None]
        new_s, new_T = jax.vmap(sim3_retract)(dxi, scale, poses)
        return new_s, new_T

    def body(carry, _):
        scale, poses, lam, cost = carry
        cand_s, cand_T = solve(scale, poses, lam)
        new_cost = sim3_graph_cost(
            graph._replace(scale=cand_s, poses=cand_T), huber_delta
        )
        accept = new_cost < cost
        scale = jnp.where(accept, cand_s, scale)
        poses = jnp.where(accept, cand_T, poses)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e6)
        return (scale, poses, lam, cost), cost

    (scale, poses, _, cost), costs = jax.lax.scan(
        body,
        (graph.scale, graph.poses, jnp.float32(damping), init_cost),
        None,
        length=iterations,
    )
    return graph._replace(scale=scale, poses=poses), PGOStats(
        initial_cost=init_cost, final_cost=cost, costs=costs
    )


@f32
def optimize_pose_graph_sim3_cg(
    graph: Sim3Graph,
    iterations: int = 12,
    damping: float = 1e-6,
    cg_iterations: int = 64,
    huber_delta: float | None = None,
) -> tuple[Sim3Graph, PGOStats]:
    """Sim(3) pose-graph Gauss-Newton with a MATRIX-FREE block-sparse CG
    inner solve (VERDICT r3 weak #5: the dense path assembles an
    (N, N, 7, 7) H and solves 7N x 7N — O(K^2) memory / O(K^3) solve,
    untestable above a few hundred keyframes).

    Here H is never materialised: the normal-equation product H @ x is
    applied edge-wise from the per-edge blocks (Hii, Hjj, Hij) via
    gather + segment-add — O(E) memory, O(E * 49) FLOPs per CG step,
    which is exactly the sparsity of a SLAM chain + loop edges.  A
    block-Jacobi preconditioner (per-node 7x7 diagonal block, factored
    once per outer iteration) keeps CG iteration counts low on the
    near-chain graphs loop closure produces.  Outer loop is the same
    branchless LM accept/reject as the dense path; results agree with
    the dense solver to fp tolerance on small graphs (tested).
    """
    N = graph.poses.shape[0]
    init_cost = sim3_graph_cost(graph, huber_delta)
    ei, ej = graph.edge_i, graph.edge_j

    def r_of(xi_i, xi_j, si, Ti, sj, Tj, zs, zT):
        return sim3_edge_residual(
            *sim3_retract(xi_i, si, Ti), *sim3_retract(xi_j, sj, Tj), zs, zT
        )

    free = (~graph.node_fixed).astype(graph.poses.dtype)[:, None]  # (N, 1)

    def solve(scale, poses, lam):
        Si, Ti = scale[ei], poses[ei]
        Sj, Tj = scale[ej], poses[ej]
        zero = jnp.zeros((7,), poses.dtype)
        args = (Si, Ti, Sj, Tj, graph.edge_s, graph.edge_T)
        r = jax.vmap(lambda *a: r_of(zero, zero, *a))(*args)
        Ji = jax.vmap(
            lambda *a: jax.jacfwd(r_of, argnums=0)(zero, zero, *a)
        )(*args)
        Jj = jax.vmap(
            lambda *a: jax.jacfwd(r_of, argnums=1)(zero, zero, *a)
        )(*args)
        w = graph.edge_weight * graph.edge_valid.astype(jnp.float32)
        if huber_delta is not None:
            w = w * _huber_irls_weights(r, huber_delta)
        w = w[:, None, None]
        Hii = jnp.einsum("eki,ekj->eij", Ji, Ji) * w      # (E, 7, 7)
        Hjj = jnp.einsum("eki,ekj->eij", Jj, Jj) * w
        Hij = jnp.einsum("eki,ekj->eij", Ji, Jj) * w
        bi = -jnp.einsum("eki,ek->ei", Ji, r) * w[..., 0]
        bj = -jnp.einsum("eki,ek->ei", Jj, r) * w[..., 0]

        b = jnp.zeros((N, 7), poses.dtype)
        b = b.at[ei].add(bi).at[ej].add(bj)
        b = b * free

        def Hx(x):
            # Gauge-fixed damped product: rows/cols of fixed nodes are
            # identity (same masking as the dense path's fm trick).
            xm = x * free
            xi, xj = xm[ei], xm[ej]
            yi = jnp.einsum("eab,eb->ea", Hii, xi) + jnp.einsum(
                "eab,eb->ea", Hij, xj
            )
            yj = jnp.einsum("eab,eb->ea", Hjj, xj) + jnp.einsum(
                "eba,eb->ea", Hij, xi
            )
            y = jnp.zeros((N, 7), poses.dtype)
            y = y.at[ei].add(yi).at[ej].add(yj)
            y = (y + (lam + 1e-8) * xm) * free + x * (1.0 - free)
            return y

        # Block-Jacobi preconditioner from the per-node diagonal blocks.
        D = jnp.zeros((N, 7, 7), poses.dtype)
        D = D.at[ei].add(Hii).at[ej].add(Hjj)
        D = D + (lam + 1e-8) * jnp.eye(7, dtype=poses.dtype)
        # Fixed nodes get identity blocks (their equations are x = 0).
        D = D * free[..., None] + jnp.eye(7, dtype=poses.dtype) * (
            1.0 - free[..., None]
        )
        Dinv = jnp.linalg.inv(D)

        def precond(v):
            return jnp.einsum("nab,nb->na", Dinv, v)

        # Preconditioned CG on H dx = b.
        x0 = jnp.zeros_like(b)
        r0 = b  # - Hx(0)
        z0 = precond(r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)

        def cg_step(carry, _):
            x, rr, z, p, rz = carry
            Ap = Hx(p)
            denom = jnp.sum(p * Ap)
            alpha = rz / jnp.where(denom > 0, denom, 1.0)
            alpha = jnp.where(denom > 0, alpha, 0.0)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.where(rz > 0, rz, 1.0)
            beta = jnp.where(rz > 0, beta, 0.0)
            p = z + beta * p
            return (x, rr, z, p, rz_new), None

        (dxi, _, _, _, _), _ = jax.lax.scan(
            cg_step, (x0, r0, z0, p0, rz0), None, length=cg_iterations
        )
        dxi = dxi * free
        new_s, new_T = jax.vmap(sim3_retract)(dxi, scale, poses)
        return new_s, new_T

    def body(carry, _):
        scale, poses, lam, cost = carry
        cand_s, cand_T = solve(scale, poses, lam)
        new_cost = sim3_graph_cost(
            graph._replace(scale=cand_s, poses=cand_T), huber_delta
        )
        accept = new_cost < cost
        scale = jnp.where(accept, cand_s, scale)
        poses = jnp.where(accept, cand_T, poses)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e6)
        return (scale, poses, lam, cost), cost

    (scale, poses, _, cost), costs = jax.lax.scan(
        body,
        (graph.scale, graph.poses, jnp.float32(damping), init_cost),
        None,
        length=iterations,
    )
    return graph._replace(scale=scale, poses=poses), PGOStats(
        initial_cost=init_cost, final_cost=cost, costs=costs
    )
