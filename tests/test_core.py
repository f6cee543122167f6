"""Unit tests for core graph ops: mesh edges, segment ops, normalizer, MLP."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyper_graph_nets_tpu.core import mesh, normalizer, segment_ops
from hyper_graph_nets_tpu.nn.mlp import mlp_apply, mlp_init


class TestCellsToEdges:
    def test_triangles_dedup_and_two_way(self):
        # two triangles sharing edge (1,2)
        cells = np.array([[0, 1, 2], [1, 2, 3]])
        e = mesh.cells_to_edges(cells)
        # unique undirected edges: (0,1),(0,2),(1,2),(1,3),(2,3) -> 10 directed
        assert len(e.senders) == 10
        pairs = set(zip(e.senders.tolist(), e.receivers.tolist()))
        assert (1, 2) in pairs and (2, 1) in pairs
        assert len(pairs) == 10
        # two-way: every edge has its reverse
        for s, r in pairs:
            assert (r, s) in pairs

    def test_sorted_by_receiver(self):
        cells = np.array([[0, 1, 2], [1, 2, 3], [2, 3, 4]])
        e = mesh.cells_to_edges(cells)
        assert np.all(np.diff(e.receivers) >= 0)

    def test_quad_cells(self):
        cells = np.array([[0, 1, 2, 3]])
        e = mesh.cells_to_edges(cells, deform=True)
        pairs = set(zip(e.senders.tolist(), e.receivers.tolist()))
        # quad perimeter: (0,1),(1,2),(2,3),(3,0) both ways
        assert len(pairs) == 8
        assert (3, 0) in pairs and (0, 3) in pairs
        assert (0, 2) not in pairs  # no diagonal

    def test_pad_edges(self):
        s, r, m = mesh.pad_edges(
            np.array([1, 2], np.int32), np.array([0, 1], np.int32), 5
        )
        assert s.shape == (5,) and m.sum() == 2 and s[-1] == 0


class TestSegmentOps:
    def setup_method(self):
        rng = np.random.RandomState(0)
        self.data = jnp.asarray(rng.randn(20, 4).astype(np.float32))
        self.ids = jnp.asarray(np.sort(rng.randint(0, 6, 20)).astype(np.int32))

    def _dense(self, op):
        out = np.zeros((6, 4), np.float32)
        d = np.asarray(self.data)
        ids = np.asarray(self.ids)
        for seg in range(6):
            rows = d[ids == seg]
            if len(rows) == 0:
                continue
            out[seg] = getattr(np, op)(rows, axis=0)
        return out

    @pytest.mark.parametrize("op", ["sum", "mean", "max", "min", "std"])
    def test_vs_dense(self, op):
        got = segment_ops.unsorted_segment_operation(
            self.data, self.ids, 6, op, indices_are_sorted=True
        )
        if op == "std":
            want = np.zeros((6, 4), np.float32)
            d, ids = np.asarray(self.data), np.asarray(self.ids)
            for seg in range(6):
                rows = d[ids == seg]
                if len(rows):
                    want[seg] = rows.std(axis=0)
        else:
            want = self._dense(op)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    def test_mask_excludes_padding(self):
        mask = jnp.ones(20).at[10:].set(0.0)
        got = segment_ops.segment_sum(self.data, self.ids, 6, mask=mask)
        d, ids = np.asarray(self.data), np.asarray(self.ids)
        want = np.zeros((6, 4), np.float32)
        for i in range(10):
            want[ids[i]] += d[i]
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    def test_masked_max_empty_segment_is_zero(self):
        data = jnp.array([[-5.0], [-3.0]])
        ids = jnp.array([0, 0], jnp.int32)
        mask = jnp.array([1.0, 0.0])
        got = segment_ops.segment_max(data, ids, 3, mask=mask)
        np.testing.assert_allclose(np.asarray(got), [[-5.0], [0.0], [0.0]])

    def test_pna_order(self):
        got = segment_ops.aggregate(self.data, self.ids, 6, "pna")
        s = segment_ops.segment_sum(self.data, self.ids, 6)
        m = segment_ops.segment_mean(self.data, self.ids, 6)
        mx = segment_ops.segment_max(self.data, self.ids, 6)
        mn = segment_ops.segment_min(self.data, self.ids, 6)
        want = jnp.concatenate([s, m, mx, mn], axis=-1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


class TestNormalizer:
    def test_statistics(self):
        rng = np.random.RandomState(1)
        xs = rng.randn(50, 3).astype(np.float32) * 2.0 + 1.0
        state = normalizer.init(3)
        out, state = normalizer.normalize(state, jnp.asarray(xs), accumulate_stats=True)
        np.testing.assert_allclose(
            np.asarray(normalizer.mean(state)), xs.mean(0), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(normalizer.std_with_epsilon(state)), xs.std(0), rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(out), (xs - xs.mean(0)) / xs.std(0), rtol=1e-3, atol=1e-4
        )

    def test_inverse_roundtrip(self):
        rng = np.random.RandomState(2)
        xs = jnp.asarray(rng.randn(10, 4).astype(np.float32))
        state = normalizer.init(4)
        out, state = normalizer.normalize(state, xs, accumulate_stats=True)
        back = normalizer.inverse(state, out)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xs), rtol=1e-4, atol=1e-5)

    def test_no_accumulation_in_eval(self):
        state = normalizer.init(2)
        _, state2 = normalizer.normalize(
            state, jnp.ones((5, 2)), accumulate_stats=False
        )
        assert float(state2.acc_count) == 0.0

    def test_accumulation_cap(self):
        state = normalizer.init(1, max_accumulations=2)
        x = jnp.ones((3, 1))
        for _ in range(5):
            _, state = normalizer.normalize(state, x, accumulate_stats=True)
        assert float(state.num_accumulations) == 2.0
        assert float(state.acc_count) == 6.0

    def test_masked_accumulation(self):
        state = normalizer.init(1)
        x = jnp.array([[1.0], [2.0], [100.0]])
        mask = jnp.array([1.0, 1.0, 0.0])
        _, state = normalizer.normalize(state, x, accumulate_stats=True, mask=mask)
        np.testing.assert_allclose(float(normalizer.mean(state)[0]), 1.5)

    def test_works_under_jit(self):
        @jax.jit
        def step(state, x):
            return normalizer.normalize(state, x, accumulate_stats=True)

        state = normalizer.init(2)
        out, state = step(state, jnp.ones((4, 2)))
        assert float(state.acc_count) == 4.0


class TestMLP:
    def test_shapes_and_numpy_parity(self):
        key = jax.random.PRNGKey(0)
        params = mlp_init(key, 5, [8, 8, 3], layer_norm=False)
        x = np.random.RandomState(0).randn(7, 5).astype(np.float32)
        got = np.asarray(mlp_apply(params, jnp.asarray(x)))
        h = x
        for i, layer in enumerate(params["layers"]):
            h = h @ np.asarray(layer["w"]) + np.asarray(layer["b"])
            if i < 2:
                h = np.maximum(h, 0)
        np.testing.assert_allclose(got, h, rtol=1e-5, atol=1e-5)

    def test_layer_norm_output_stats(self):
        key = jax.random.PRNGKey(1)
        params = mlp_init(key, 4, [16, 32], layer_norm=True)
        x = jnp.asarray(np.random.RandomState(1).randn(10, 4).astype(np.float32))
        y = np.asarray(mlp_apply(params, x))
        np.testing.assert_allclose(y.mean(-1), np.zeros(10), atol=1e-4)
        np.testing.assert_allclose(y.std(-1), np.ones(10), atol=1e-2)

    def test_init_matches_torch_linear_bounds(self):
        key = jax.random.PRNGKey(2)
        params = mlp_init(key, 100, [64], layer_norm=False)
        w = np.asarray(params["layers"][0]["w"])
        assert np.abs(w).max() <= 0.1 + 1e-6  # 1/sqrt(100)

    def test_bfloat16_compute(self):
        key = jax.random.PRNGKey(3)
        params = mlp_init(key, 8, [16, 4])
        x = jnp.ones((4, 8))
        y32 = mlp_apply(params, x)
        ybf = mlp_apply(params, x, compute_dtype=jnp.bfloat16)
        # low-precision residual stream: activations stay in compute dtype
        # (the decoder casts the final output back to f32)
        assert ybf.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(y32), np.asarray(ybf, dtype=np.float32), atol=0.1
        )
