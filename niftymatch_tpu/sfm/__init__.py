"""Structure-from-motion backend: SE(3), triangulation, BA, pose graphs.

Net-new 3-D layer over the reference's 2-D capability set (SURVEY.md §7
M2/M4; BASELINE configs 2-4)."""

from .ba import BAProblem, BAStats, ba_cost, bundle_adjust, project
from .ba_cg import bundle_adjust_cg
from .posegraph import (
    PGOStats,
    PoseGraph,
    Sim3Graph,
    edge_residual,
    graph_cost,
    optimize_pose_graph,
    optimize_pose_graph_sim3,
    sim3_graph_cost,
)
from .sim3 import (
    sim3_apply,
    sim3_compose,
    sim3_inverse,
    sim3_retract,
)
from .se3 import (
    hat,
    se3_apply,
    se3_compose,
    se3_exp,
    se3_identity,
    se3_inverse,
    se3_log,
    se3_relative,
    so3_exp,
    so3_log,
)
from .triangulation import (
    PoseRecovery,
    decompose_essential,
    recover_pose,
    reprojection_error,
    triangulate_dlt,
    triangulate_midpoint,
)

__all__ = [
    "BAProblem",
    "BAStats",
    "PGOStats",
    "PoseGraph",
    "PoseRecovery",
    "Sim3Graph",
    "ba_cost",
    "bundle_adjust",
    "bundle_adjust_cg",
    "decompose_essential",
    "edge_residual",
    "graph_cost",
    "hat",
    "optimize_pose_graph",
    "optimize_pose_graph_sim3",
    "project",
    "sim3_apply",
    "sim3_compose",
    "sim3_graph_cost",
    "sim3_inverse",
    "sim3_retract",
    "recover_pose",
    "reprojection_error",
    "se3_apply",
    "se3_compose",
    "se3_exp",
    "se3_identity",
    "se3_inverse",
    "se3_log",
    "se3_relative",
    "so3_exp",
    "so3_log",
    "triangulate_dlt",
    "triangulate_midpoint",
]
