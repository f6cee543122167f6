"""Controlled accuracy comparison on FLAG: this framework vs the torch reference.

Companion to tools/control_plate.py (see its docstring for the rationale —
no network egress, so the accuracy target is demonstrated as a controlled
experiment on identical synthetic data).  This one covers the flag system:
2nd-order integrator with position history (reference src/model/flag.py),
mesh edges only, MGN (architecture none) and HGN (spectral + hyper) runs.

Usage: python tools/control_flag.py <ref-mgn|ref-hgn|ours-mgn|ours-hgn|all>
Writes CONTROL_flag_<run>.json into control_out/.
"""
from __future__ import annotations

import json
import os
import random
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_DIR = os.path.join(REPO, "control_out")

# ---- protocol (identical for every run) ----------------------------------
NX = NY = 12          # 144 cloth nodes
T_RAW = 50            # raw steps -> 47 windowed frames (history)
N_TRAIN = 12
N_TEST = 3
EPOCHS = 10
LR = 1e-4
MP_STEPS = 5
NOISE = 0.003
GAMMA = 0.1           # reference configs/flag.yaml noise gamma
NUM_CLUSTERS = 8
HYPER_NOISE = 0.005
N_STEP = 10


def make_data():
    from hyper_graph_nets_tpu.data import synthetic
    from hyper_graph_nets_tpu.data.preprocessing import add_targets

    mk = lambda seed: add_targets(
        synthetic.flag_trajectory(num_steps=T_RAW, nx=NX, ny=NY, seed=seed),
        "world_pos",
        history=True,
    )
    return [mk(i) for i in range(N_TRAIN)], [mk(100 + i) for i in range(N_TEST)]


def model_config(hgn: bool) -> dict:
    rmp_common = {
        "num_clusters": NUM_CLUSTERS,
        "hyper_noise": HYPER_NOISE,
        "hyper_node_features": True,
        "frequency": 1,
        "fully_connect": False,
        "intra_cluster_sampling": {
            "enabled": False, "alpha": 0.1, "spotter_threshold": 0,
        },
        "hdbscan": {
            "max_cluster_size": 50, "min_cluster_size": 20,
            "min_samples": 1, "spotter_threshold": 0.9,
        },
    }
    rmp = dict(
        rmp_common,
        clustering="spectral" if hgn else "none",
        connector="hyper" if hgn else "none",
    )
    return {
        "field": "world_pos",
        "history": True,
        "size": 3,
        "noise": NOISE,
        "gamma": GAMMA,
        "aggregation": "pna",
        "learning_rate": LR,
        "message_passing_steps": MP_STEPS,
        "rmp": rmp,
        "graph_balancer": {
            "algorithm": "none",
            "frequency": 1,
            "remove_edges": True,
            "ricci": {"loops": 150, "tau": 150},
            "random": {"edge_amount": 100},
        },
    }


def aligned_mse(pred: np.ndarray, gt: np.ndarray) -> float:
    """pred[s] is the state after s+1 updates -> compare to gt[s+1]."""
    n = min(len(pred) - 1, len(gt) - 1)
    return float(np.mean((pred[:n] - gt[1 : n + 1]) ** 2))


# ---------------------------------------------------------------------------
# torch reference driver
# ---------------------------------------------------------------------------
def run_reference(hgn: bool, seed: int = 0) -> dict:
    import torch

    from tests.refbridge import load_reference

    load_reference()
    from src.model.flag import FlagModel

    # seed varies init + shuffle order; training noise stays seed-invariant
    # because the reference loader reseeds np to 0 per epoch (graphloader.py:14)
    torch.manual_seed(seed)
    np.random.seed(seed)
    random.seed(seed)

    train, test = make_data()
    model = FlagModel(model_config(hgn))
    opt = torch.optim.Adam(model.parameters(), lr=LR)

    def to_frames(traj, noisy):
        T = traj["world_pos"].shape[0]
        frames = []
        for i in range(T):
            f = {k: torch.from_numpy(np.array(v[i])) for k, v in traj.items()}
            f["node_type"] = f["node_type"].int()
            f["cells"] = f["cells"].long()
            if noisy:
                # reference Preprocessing._add_noise (preprocessing.py:84-98):
                # noise on the noise_field only, (1-gamma) target compensation
                noise = torch.from_numpy(
                    np.random.normal(0, NOISE, f["world_pos"].shape).astype(
                        np.float32
                    )
                )
                mask = (f["node_type"][:, 0] == 0)[:, None]
                noise = torch.where(mask, noise, torch.zeros_like(noise))
                f["world_pos"] = f["world_pos"] + noise
                f["target|world_pos"] = f["target|world_pos"] + (1.0 - GAMMA) * noise
            frames.append(f)
        return frames

    def to_torch_traj(traj):
        out = {k: torch.from_numpy(np.array(v)) for k, v in traj.items()}
        out["node_type"] = out["node_type"].int()
        out["cells"] = out["cells"].long()
        return out

    history = []
    t_start = time.time()
    for epoch in range(EPOCHS):
        model.train()
        np.random.seed(0)  # reference GraphDataLoader reseeds per epoch
        for traj in train:
            frames = to_frames(traj, noisy=True)
            num_steps = len(frames)
            batches = []
            for i, frame in enumerate(frames):
                graph = model.build_graph(frame, is_training=True)
                graph = model.expand_graph(graph, i, num_steps, is_training=True)
                batches.append((graph, frame))
            random.shuffle(batches)  # MeshSimulator.py:138
            for graph, frame in batches:
                loss = model.training_step(graph, frame)
                loss.backward()
                opt.step()
                opt.zero_grad()

        model.eval()
        roll_internal, roll_aligned = [], []
        for traj in test:
            tt = to_torch_traj(traj)
            ops, mse = model.rollout(tt, num_steps=None)
            pred = ops["pred_pos"].detach().numpy()
            gt = traj["world_pos"]
            roll_internal.append(float(mse.mean()))
            roll_aligned.append(aligned_mse(pred, gt))
        rec = {
            "epoch": epoch,
            "rollout_mse_internal": float(np.mean(roll_internal)),
            "rollout_mse_aligned": float(np.mean(roll_aligned)),
            "wall_s": time.time() - t_start,
        }
        history.append(rec)
        print(json.dumps(rec), flush=True)

    n_means, n_lasts = [], []
    for traj in test:
        m, l = model.n_step_computation(to_torch_traj(traj), N_STEP)
        n_means.append(float(m))
        n_lasts.append(float(l))
    return {
        "history": history,
        "n_step_loss": float(np.mean(n_means)),
        "n_step_last_loss": float(np.mean(n_lasts)),
        "total_wall_s": time.time() - t_start,
    }


# ---------------------------------------------------------------------------
# our driver
# ---------------------------------------------------------------------------
def _ablate(cfg: dict) -> dict:
    """Seed-variance ablation knobs (VERDICT r4 #7: flag ours-HGN seed-2
    instability).  CONTROL_ABLATE flips exactly ONE variable against the
    shipped ours-hgn numerics; set CONTROL_TAG alongside so results land
    in distinct files:
      hyper_noise0 — no hyper-node feature noise (suspect: hyper-noise RNG
                     placement differs from reference
                     hierarchical_connector.py:47-50)
      f32          — full float32 compute (suspect: bf16 in the cluster tier)
      kmeans       — kmeans clustering (suspect: spectral label instability
                     across reclusters)
    """
    mode = os.environ.get("CONTROL_ABLATE", "")
    if not mode:
        return cfg
    cfg = dict(cfg)
    if mode == "hyper_noise0":
        cfg["rmp"] = dict(cfg["rmp"], hyper_noise=0.0)
    elif mode == "f32":
        cfg["compute_dtype"] = None
    elif mode == "kmeans":
        cfg["rmp"] = dict(cfg["rmp"], clustering="kmeans")
    else:
        raise SystemExit(f"unknown CONTROL_ABLATE={mode!r}")
    return cfg


def run_ours(hgn: bool, seed: int = 0, shipped: bool = False) -> dict:
    from hyper_graph_nets_tpu.training.simulator import MeshSimulator
    from tools.control_common import shipped_overrides

    train, test = make_data()
    params = {
        "task": {"dataset": "flag_simple", "batch_size": 1},
        "model": _ablate(
            shipped_overrides(model_config(hgn)) if shipped
            else model_config(hgn)
        ),
        "random_seed": seed,
    }
    sim = MeshSimulator(params, out_dir=os.path.join(OUT_DIR, "ours_flag_tmp"))
    ts = sim.initialize()

    history = []
    t_start = time.time()
    for epoch in range(EPOCHS):
        for traj in train:
            ts, _ = sim.fit_trajectory(ts, traj, epoch=epoch)
        res = sim.rollout_evaluator(ts, test, logging=False, save=False)
        roll_aligned = [
            aligned_mse(np.asarray(r["pred_pos"]), np.asarray(r["gt_pos"]))
            for r in res["rollouts"]
        ]
        rec = {
            "epoch": epoch,
            "rollout_mse_internal": float(res["rollout_loss"]),
            "rollout_mse_aligned": float(np.mean(roll_aligned)),
            "wall_s": time.time() - t_start,
        }
        history.append(rec)
        print(json.dumps(rec), flush=True)

    nres = sim.n_step_evaluator(ts, test, n_step=N_STEP, logging=False)
    return {
        "history": history,
        "n_step_loss": nres["n_step_loss"],
        "n_step_last_loss": nres["n_step_last_loss"],
        "total_wall_s": time.time() - t_start,
    }


RUNS = {
    "ref-mgn": lambda seed, shipped: run_reference(False, seed),
    "ref-hgn": lambda seed, shipped: run_reference(True, seed),
    "ours-mgn": lambda seed, shipped: run_ours(False, seed, shipped),
    "ours-hgn": lambda seed, shipped: run_ours(True, seed, shipped),
}


def main():
    from tools.control_common import control_main

    control_main("flag", RUNS, OUT_DIR)


if __name__ == "__main__":
    main()
