"""tf.data ingestion pipeline (optional high-throughput loader).

The default loader (data/tfrecord.py) is a dependency-free single-threaded
reader — fine for development.  For production streaming of the multi-GB
DeepMind datasets, this module builds a tf.data pipeline: parallel TFRecord
reads + Example parsing, per-host sharding on pod slices, shuffling, and
host-RAM prefetch.  Enable with ``task.loader: tfdata``.

TensorFlow is imported lazily and only used for host-side IO — device
compute stays pure JAX.
"""
from __future__ import annotations

import os
from typing import Dict, Iterator, Optional

import numpy as np

from hyper_graph_nets_tpu.data.preprocessing import add_targets, load_meta


def tf_trajectories(
    in_dir: str,
    split: str,
    shuffle: bool = False,
    shuffle_buffer: int = 8,
    num_parallel_reads: int = 4,
    shard_across_hosts: bool = True,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Stream decoded trajectory dicts via tf.data."""
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")  # host-side IO only

    meta = load_meta(in_dir)
    features = meta["features"]
    T = meta["trajectory_length"]
    spec = {k: tf.io.FixedLenFeature([], tf.string) for k in features}

    path = os.path.join(in_dir, f"{split}.tfrecord")
    ds = tf.data.TFRecordDataset(path, num_parallel_reads=num_parallel_reads)
    if shard_across_hosts:
        import jax

        if jax.process_count() > 1:
            ds = ds.shard(jax.process_count(), jax.process_index())
    if shuffle:
        ds = ds.shuffle(shuffle_buffer, seed=seed, reshuffle_each_iteration=True)

    def parse(raw):
        ex = tf.io.parse_single_example(raw, spec)
        out = {}
        for key, field in features.items():
            arr = tf.io.decode_raw(ex[key], getattr(tf, field["dtype"]))
            arr = tf.reshape(arr, field["shape"])
            if field["type"] == "static":
                arr = tf.tile(arr, [T, 1, 1])
            out[key] = arr
        return out

    ds = ds.map(parse, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.prefetch(tf.data.AUTOTUNE)
    for item in ds.as_numpy_iterator():
        yield item


class TFDataSource:
    """Restartable source matching the Preprocessing iterable contract."""

    def __init__(
        self,
        model_config: dict,
        split: str,
        in_dir: str,
        shuffle: Optional[bool] = None,
        add_targets_b: bool = True,
    ):
        self._field = model_config["field"]
        self._history = bool(model_config.get("history", False))
        self._in_dir = in_dir
        self._split = split
        self._shuffle = (split == "train") if shuffle is None else shuffle
        self._add_targets = add_targets_b

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for traj in tf_trajectories(self._in_dir, self._split, shuffle=self._shuffle):
            if self._add_targets:
                yield add_targets(traj, self._field, self._history)
            else:
                yield traj
