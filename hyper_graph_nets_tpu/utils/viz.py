"""Rollout visualization: animated GIFs per dataset family.

Parity with reference src/tasks/MeshTask.py:151-392:
- flag: 3-D trisurf animation of predicted vs ground-truth cloth (plot, :282-340)
- plate: two-panel 3-D scatter with obstacle masking (plot_2, :220-280)
- cylinder: 2-D tripcolor field animation (plot_3, :151-218)
GIFs are written with PillowWriter (reference :370-392).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import animation  # noqa: E402


def _quad_to_tris(faces: np.ndarray) -> np.ndarray:
    if faces.shape[-1] == 3:
        return faces
    a = faces[:, [0, 1, 2]]
    b = faces[:, [2, 3, 0]]
    return np.concatenate([a, b], axis=0)


def animate_flag(traj_ops: Dict[str, np.ndarray], path: str, stride: int = 1) -> str:
    """3-D cloth animation: prediction (left) vs ground truth (right)."""
    pred = np.asarray(traj_ops["pred_pos"])[::stride]
    gt = np.asarray(traj_ops["gt_pos"])[: len(pred) * stride : stride]
    faces = _quad_to_tris(np.asarray(traj_ops["faces"])[0])
    fig = plt.figure(figsize=(10, 5))
    ax1 = fig.add_subplot(121, projection="3d")
    ax2 = fig.add_subplot(122, projection="3d")
    lims = np.stack([gt.min(axis=(0, 1)), gt.max(axis=(0, 1))])

    def draw(i):
        for ax, data, title in ((ax1, pred, "prediction"), (ax2, gt, "ground truth")):
            ax.clear()
            ax.set_title(f"{title} t={i * stride}")
            ax.plot_trisurf(
                data[i][:, 0], data[i][:, 1], data[i][:, 2],
                triangles=faces, alpha=0.8,
            )
            ax.set_xlim(lims[0, 0], lims[1, 0])
            ax.set_ylim(lims[0, 1], lims[1, 1])
            ax.set_zlim(lims[0, 2], lims[1, 2])
        return []

    anim = animation.FuncAnimation(fig, draw, frames=len(pred), interval=100)
    anim.save(path, writer=animation.PillowWriter(fps=10))
    plt.close(fig)
    return path


def animate_plate(traj_ops: Dict[str, np.ndarray], path: str, stride: int = 1) -> str:
    """Two-panel 3-D scatter with obstacle nodes masked out."""
    pred = np.asarray(traj_ops["pred_pos"])[::stride]
    gt = np.asarray(traj_ops["gt_pos"])[: len(pred) * stride : stride]
    mask = np.asarray(traj_ops.get("mask"))
    keep = ~mask if mask is not None and mask.dtype == bool else slice(None)
    fig = plt.figure(figsize=(10, 5))
    ax1 = fig.add_subplot(121, projection="3d")
    ax2 = fig.add_subplot(122, projection="3d")

    def draw(i):
        for ax, data, title in ((ax1, pred, "prediction"), (ax2, gt, "ground truth")):
            ax.clear()
            ax.set_title(f"{title} t={i * stride}")
            pts = data[i][keep]
            obs = data[i][~np.asarray(keep)] if mask is not None else None
            ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=4, c="tab:blue")
            if obs is not None and len(obs):
                ax.scatter(obs[:, 0], obs[:, 1], obs[:, 2], s=4, c="tab:red")
        return []

    anim = animation.FuncAnimation(fig, draw, frames=len(pred), interval=100)
    anim.save(path, writer=animation.PillowWriter(fps=10))
    plt.close(fig)
    return path


def animate_cylinder(traj_ops: Dict[str, np.ndarray], path: str, stride: int = 1) -> str:
    """2-D velocity-magnitude field animation (tripcolor)."""
    pred = np.asarray(traj_ops["pred_velocity"])[::stride]
    gt = np.asarray(traj_ops["gt_velocity"])[: len(pred) * stride : stride]
    mesh = np.asarray(traj_ops["mesh_pos"])[0]
    faces = _quad_to_tris(np.asarray(traj_ops["faces"])[0])
    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(8, 6))

    def draw(i):
        for ax, data, title in ((ax1, pred, "prediction"), (ax2, gt, "ground truth")):
            ax.clear()
            speed = np.linalg.norm(data[i], axis=-1)
            ax.tripcolor(mesh[:, 0], mesh[:, 1], faces, speed, shading="gouraud")
            ax.set_title(f"{title} t={i * stride}")
            ax.set_aspect("equal")
        return []

    anim = animation.FuncAnimation(fig, draw, frames=len(pred), interval=100)
    anim.save(path, writer=animation.PillowWriter(fps=10))
    plt.close(fig)
    return path


def animate_rollout(
    traj_ops: Dict[str, np.ndarray], model_type: str, path: str, stride: int = 1
) -> Optional[str]:
    """Dispatch per dataset family (reference select_plotting, MeshTask.py:131-149)."""
    try:
        if model_type == "cylinder":
            return animate_cylinder(traj_ops, path, stride)
        if model_type == "plate":
            return animate_plate(traj_ops, path, stride)
        return animate_flag(traj_ops, path, stride)
    except Exception:
        return None
