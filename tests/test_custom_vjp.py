"""Tests for the gather-only custom-VJP pna aggregation primitive."""
import jax
import jax.numpy as jnp
import numpy as np

from hyper_graph_nets_tpu.core.mesh import receivers_to_gather
from hyper_graph_nets_tpu.core.segment_ops import gather_aggregate, pna_gather


class TestPnaGatherVJP:
    def setup_method(self):
        rng = np.random.RandomState(0)
        self.E, self.N, self.F = 40, 12, 5
        self.rcv = np.sort(rng.randint(0, self.N, self.E)).astype(np.int32)
        gidx, gval = receivers_to_gather(self.rcv, self.N)
        self.gidx, self.gval = jnp.asarray(gidx), jnp.asarray(gval)
        self.data = jnp.asarray(rng.randn(self.E, self.F).astype(np.float32))
        self.mask = jnp.ones(self.E)

    def test_forward_matches_reference(self):
        a = pna_gather(self.data, self.gidx, self.gval, jnp.asarray(self.rcv), self.mask)
        b = gather_aggregate(self.data, self.gidx, self.gval, "pna")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_gradient_matches_autodiff(self):
        f1 = lambda d: jnp.sum(
            jnp.sin(pna_gather(d, self.gidx, self.gval, jnp.asarray(self.rcv), self.mask))
        )
        f2 = lambda d: jnp.sum(jnp.sin(gather_aggregate(d, self.gidx, self.gval, "pna")))
        g1 = jax.grad(f1)(self.data)
        g2 = jax.grad(f2)(self.data)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)

    def test_masked_edges_get_zero_cotangent(self):
        mask = self.mask.at[3:7].set(0.0)
        gval = np.asarray(self.gval) * (
            1 - np.isin(np.asarray(self.gidx), [3, 4, 5, 6]) * (np.asarray(self.gval) > 0)
        )
        g = jax.grad(
            lambda d: jnp.sum(
                jnp.sin(
                    pna_gather(
                        d, self.gidx, jnp.asarray(gval, jnp.float32),
                        jnp.asarray(self.rcv), mask,
                    )
                )
            )
        )(self.data)
        assert float(jnp.abs(g[3:7]).max()) == 0.0

    def test_vmap(self):
        data = jnp.stack([self.data, self.data * 2])
        out = jax.vmap(
            lambda d: pna_gather(d, self.gidx, self.gval, jnp.asarray(self.rcv), self.mask)
        )(data)
        ref = jax.vmap(lambda d: gather_aggregate(d, self.gidx, self.gval, "pna"))(data)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
