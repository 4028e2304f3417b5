"""Checkpoint / resume for the incremental stepper.

The reference has no checkpointing (SURVEY.md §5); its restartable state is
exactly (aggregate_u, aggregate_stress, Vec_U/du, dtNo) (main.F90:129-132,
216) — plus, for viscoelastic runs, the per-ip creep stress state. Here that
state is a flat npz written atomically per step; `latest` finds the newest
step in a directory and the stepper resumes mid-run.
"""

from __future__ import annotations

import os
import tempfile
from typing import Dict, Optional, Tuple

import numpy as np

_CREEP_PREFIX = "creep__"


def save(path_dir: str, step: int, aggregate_u, aggregate_stress, du,
         creep_state: Optional[Dict] = None) -> str:
    os.makedirs(path_dir, exist_ok=True)
    path = os.path.join(path_dir, f"state_{step:06d}.npz")
    fd, tmp = tempfile.mkstemp(dir=path_dir, suffix=".tmp")
    extra = {
        _CREEP_PREFIX + name: np.asarray(sigma)
        for name, sigma in (creep_state or {}).items()
    }
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(
                f,
                step=np.asarray(step),
                aggregate_u=np.asarray(aggregate_u),
                aggregate_stress=np.asarray(aggregate_stress),
                du=np.asarray(du),
                **extra,
            )
        os.replace(tmp, path)  # atomic: no torn checkpoints on interruption
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def load(
    path: str,
) -> Tuple[int, np.ndarray, np.ndarray, np.ndarray, Dict[str, np.ndarray]]:
    with np.load(path) as z:
        creep = {
            k[len(_CREEP_PREFIX):]: z[k]
            for k in z.files
            if k.startswith(_CREEP_PREFIX)
        }
        return (
            int(z["step"]),
            z["aggregate_u"],
            z["aggregate_stress"],
            z["du"],
            creep,
        )


def latest(path_dir: str) -> Optional[str]:
    if not os.path.isdir(path_dir):
        return None
    names = sorted(
        n for n in os.listdir(path_dir)
        if n.startswith("state_") and n.endswith(".npz")
    )
    return os.path.join(path_dir, names[-1]) if names else None
