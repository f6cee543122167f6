"""Data pipeline tests: TFRecord codec, preprocessing windows, loader."""
import json
import os

import numpy as np
import pytest

from hyper_graph_nets_tpu.data import synthetic, tfrecord
from hyper_graph_nets_tpu.data.preprocessing import add_targets
from hyper_graph_nets_tpu.data.loader import get_data


class TestTFRecordCodec:
    def test_example_roundtrip(self):
        feats = {"a": b"\x01\x02\x03", "world_pos": np.arange(12, dtype=np.float32).tobytes()}
        buf = tfrecord.build_example(feats)
        out = tfrecord.parse_example(buf)
        assert out == feats

    def test_crc32c_known_value(self):
        # RFC 3720 test vector: 32 bytes of zeros
        assert tfrecord.crc32c(b"\x00" * 32) == 0x8A9136AA

    def test_file_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.tfrecord")
        payloads = [b"hello", b"world", b"x" * 1000]
        tfrecord.write_records(path, iter(payloads))
        assert list(tfrecord.read_records(path)) == payloads

    def test_trajectory_roundtrip(self, tmp_path):
        traj = synthetic.flag_trajectory(num_steps=6, nx=4, ny=4)
        path = str(tmp_path / "train.tfrecord")
        tfrecord.write_trajectories(path, [traj, traj])
        meta = synthetic.make_meta("flag_minimal", traj)
        out = list(tfrecord.read_trajectories(path, meta))
        assert len(out) == 2
        for key in traj:
            np.testing.assert_array_equal(out[0][key], traj[key])

    def test_tensorflow_can_read_our_records(self, tmp_path):
        """Cross-validate the hand-rolled codec against TF's parser."""
        tf = pytest.importorskip("tensorflow")
        traj = synthetic.flag_trajectory(num_steps=4, nx=4, ny=4)
        path = str(tmp_path / "x.tfrecord")
        tfrecord.write_trajectories(path, [traj])
        ds = tf.data.TFRecordDataset(path)
        raw = next(iter(ds)).numpy()
        ex = tf.train.Example()
        ex.ParseFromString(raw)
        keys = set(ex.features.feature.keys())
        assert keys == set(traj.keys())
        wp = np.frombuffer(
            ex.features.feature["world_pos"].bytes_list.value[0], np.float32
        )
        np.testing.assert_array_equal(wp, traj["world_pos"].ravel())


class TestPreprocessing:
    def test_add_targets_windows(self):
        traj = synthetic.flag_trajectory(num_steps=8, nx=4, ny=4)
        out = add_targets(traj, "world_pos", history=True)
        T = 8
        assert out["world_pos"].shape[0] == T - 2
        np.testing.assert_array_equal(out["world_pos"], traj["world_pos"][1:-1])
        np.testing.assert_array_equal(out["prev|world_pos"], traj["world_pos"][:-2])
        np.testing.assert_array_equal(out["target|world_pos"], traj["world_pos"][2:])

    def test_no_history(self):
        traj = synthetic.cylinder_trajectory(num_steps=6, nx=5, ny=4)
        out = add_targets(traj, "velocity", history=False)
        assert "prev|velocity" not in out
        assert "target|velocity" in out


class TestLoader:
    def test_synthetic_generation_and_streaming(self, tmp_path):
        config = {
            "params": {
                "task": {
                    "dataset": "flag_minimal",
                    "synthetic": {"trajectories": 2, "num_steps": 8, "nx": 4, "ny": 4},
                },
                "model": {"field": "world_pos", "history": True},
            }
        }
        loader = get_data(config, "train", data_dir=str(tmp_path))
        trajs = loader.take(5)
        assert len(trajs) == 2
        assert "prev|world_pos" in trajs[0]
        # files were written through the TFRecord path
        assert os.path.exists(tmp_path / "flag_minimal/input/train.tfrecord")
        assert os.path.exists(tmp_path / "flag_minimal/input/meta.json")
        with open(tmp_path / "flag_minimal/input/meta.json") as f:
            meta = json.load(f)
        assert meta["features"]["world_pos"]["type"] == "dynamic"
        assert meta["features"]["cells"]["type"] == "static"

    def test_tfdata_loader_matches_python_loader(self, tmp_path):
        pytest.importorskip("tensorflow")
        config = {
            "params": {
                "task": {
                    "dataset": "flag_minimal",
                    "synthetic": {"trajectories": 2, "num_steps": 8, "nx": 4, "ny": 4},
                },
                "model": {"field": "world_pos", "history": True},
            }
        }
        py = get_data(config, "valid", data_dir=str(tmp_path)).take(2)
        config["params"]["task"]["loader"] = "tfdata"
        tfd = get_data(config, "valid", data_dir=str(tmp_path)).take(2)
        assert len(py) == len(tfd)
        for a, b in zip(py, tfd):
            assert set(a.keys()) == set(b.keys())
            for key in a:
                np.testing.assert_array_equal(a[key], b[key])

    def test_restartable_iteration(self, tmp_path):
        config = {
            "params": {
                "task": {
                    "dataset": "flag_minimal",
                    "synthetic": {"trajectories": 1, "num_steps": 6, "nx": 4, "ny": 4},
                },
                "model": {"field": "world_pos", "history": True},
            }
        }
        loader = get_data(config, "valid", data_dir=str(tmp_path))
        a = loader.take(1)
        b = loader.take(1)
        np.testing.assert_array_equal(a[0]["world_pos"], b[0]["world_pos"])


class TestPoisonedArtifacts:
    """Corrupt/truncated data-dir artifacts must heal or fail loudly,
    never silently train on nothing (round-4 verdict #3)."""

    CONFIG = {
        "params": {
            "task": {
                "dataset": "flag_minimal",
                "synthetic": {"trajectories": 2, "num_steps": 8, "nx": 4, "ny": 4},
            },
            "model": {"field": "world_pos", "history": True},
        }
    }

    def _generate(self, tmp_path):
        get_data(self.CONFIG, "train", data_dir=str(tmp_path)).take(1)
        return tmp_path / "flag_minimal" / "input"

    def test_zero_byte_meta_regenerates(self, tmp_path):
        in_dir = self._generate(tmp_path)
        (in_dir / "meta.json").write_text("")  # the observed corpse
        trajs = get_data(self.CONFIG, "train", data_dir=str(tmp_path)).take(5)
        assert len(trajs) == 2
        assert json.load(open(in_dir / "meta.json"))["features"]

    def test_truncated_tfrecord_regenerates(self, tmp_path):
        in_dir = self._generate(tmp_path)
        raw = (in_dir / "train.tfrecord").read_bytes()
        (in_dir / "train.tfrecord").write_bytes(raw[: len(raw) // 2])
        # truncate mid-corpus, also corrupt the first length header so the
        # cheap probe sees it
        (in_dir / "valid.tfrecord").write_bytes(b"\x00" * 8)
        trajs = get_data(self.CONFIG, "valid", data_dir=str(tmp_path)).take(5)
        assert len(trajs) == 1

    def test_mid_file_corruption_fails_loudly(self, tmp_path):
        # first record intact (cheap probe passes), second record's length
        # CRC flipped -> the stream must raise, and the prefetch thread
        # must re-raise into the consumer instead of ending the iterator
        in_dir = self._generate(tmp_path)
        path = in_dir / "train.tfrecord"
        raw = bytearray(path.read_bytes())
        import struct as _struct

        (length,) = _struct.unpack("<Q", bytes(raw[:8]))
        second = 12 + length + 4
        raw[second + 8] ^= 0xFF  # second record's length-CRC byte
        path.write_bytes(bytes(raw))
        loader = get_data(self.CONFIG, "train", data_dir=str(tmp_path))
        with pytest.raises(RuntimeError, match="prefetch"):
            list(loader)

    def test_main_returns_nonzero_on_nan_scalars(self, monkeypatch):
        import main as main_mod

        class FakeTask:
            def run_iterations(self):
                pass

            def get_scalars(self):
                return {"test_position_error": float("nan")}

        monkeypatch.setattr(
            "hyper_graph_nets_tpu.training.task.get_task",
            lambda config, data_dir=None: FakeTask(),
        )
        assert main_mod.main(["minimal", "--cpu"]) == 1

    def test_atomic_writes_leave_no_tmp(self, tmp_path):
        in_dir = self._generate(tmp_path)
        leftovers = [p for p in os.listdir(in_dir) if ".tmp." in p]
        assert leftovers == []
