"""Optimizer-state checkpoint / resume.

The reference has none (SURVEY.md §5: "No checkpoint/restart of
optimization"); its only persistence is the two warm-start channels
(mid-end opt_x → back end, per-point lastTstar).  This module makes solver
state durable: the decision vector x, the swept-SDF t* warm starts, and the
problem definition hash, as a .npz — enough to resume an interrupted solve
or replay it deterministically on another host.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Dict, Optional

import numpy as np


def problem_fingerprint(conf, N: int, n_points: int) -> str:
    payload = json.dumps(
        {"conf": sorted(
            (k, str(v)) for k, v in conf.__dict__.items()
        ), "N": N, "P": n_points},
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def save(path: str, x, t_star, conf, extra: Optional[Dict[str, Any]] = None):
    np.savez(
        path,
        x=np.asarray(x),
        t_star=np.asarray(t_star),
        fingerprint=problem_fingerprint(conf, 0, len(np.asarray(t_star))),
        **(extra or {}),
    )


def load(path: str, conf=None):
    data = np.load(path, allow_pickle=False)
    return data["x"], data["t_star"], str(data["fingerprint"])
