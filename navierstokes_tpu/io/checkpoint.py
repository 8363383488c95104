"""Checkpoint / resume.

The reference only has write-only per-step dumps (no reader, no resume —
SURVEY.md §5).  Here checkpointing is a first-class subsystem: the full
solver state (u, u_old, delta_u, step index, config fingerprint) round-trips
through a single `.npz`, and `resume` validates the fingerprint so a restart
silently continuing with different physics is impossible.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from typing import Optional

import numpy as np


def _config_fingerprint(cfg) -> str:
    payload = json.dumps(dataclasses.asdict(cfg), sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def save_checkpoint(path: str, *, cfg, step: int, u, u_old, delta_u=None) -> None:
    np.savez(
        path,
        fingerprint=np.array(_config_fingerprint(cfg)),
        step=np.array(step, dtype=np.int64),
        u=np.asarray(u),
        u_old=np.asarray(u_old),
        delta_u=np.asarray(delta_u) if delta_u is not None else np.zeros_like(
            np.asarray(u)
        ),
    )


def load_checkpoint(path: str, *, cfg=None):
    """Returns (step, u, u_old, delta_u). If cfg is given, verify fingerprint."""
    with np.load(path) as data:
        if cfg is not None:
            want = _config_fingerprint(cfg)
            got = str(data["fingerprint"])
            if got != want:
                raise ValueError(
                    f"checkpoint config fingerprint {got} != current {want}; "
                    "refusing to resume with different physics/numerics"
                )
        return (
            int(data["step"]),
            data["u"],
            data["u_old"],
            data["delta_u"],
        )
