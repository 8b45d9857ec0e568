from isdf_tpu.plan.manager import PlannerManager, PlanResult  # noqa: F401
from isdf_tpu.plan.traj_server import TrajServer  # noqa: F401
from isdf_tpu.plan.closed_loop import FlightLog, fly_closed_loop  # noqa: F401
from isdf_tpu.plan.goals import (  # noqa: F401
    GoalPool, ManualTakeOver, assign_goal, sample_free_goals,
)
from isdf_tpu.plan.planar import PlanarResult, plan_planar, audit_planar  # noqa: F401
