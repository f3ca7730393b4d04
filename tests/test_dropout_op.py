"""ops/dropout.py — the Pallas dropout-mask generator's host-side logic
and its off-TPU fallback (the TPU mask semantics — exact keep rate,
determinism, key dependence, {0, 1/(1-p)} values — are hardware-verified;
see benchmarks/RESULTS.md round-3 'in-kernel dropout' entry)."""

import jax
import jax.numpy as jnp
import numpy as np

from gdl_tpu.ops.dropout import _row_block, dropout


def test_fallback_is_flax_bernoulli_math():
    """Off-TPU, dropout() must be bitwise nn.Dropout's bernoulli+select
    on the same rng (the transformer's CPU train path)."""
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 20, 128)),
                    jnp.float32)
    rng = jax.random.PRNGKey(9)
    got = dropout(x, 0.25, rng)
    keep = jax.random.bernoulli(rng, 0.75, x.shape)
    want = jax.lax.select(keep, x / 0.75, jnp.zeros_like(x))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert 0.1 < float((got == 0).mean()) < 0.4


def test_rate_zero_identity():
    x = jnp.ones((2, 8, 128))
    np.testing.assert_array_equal(
        np.asarray(dropout(x, 0.0, jax.random.PRNGKey(0))), np.asarray(x))


def test_row_block_divides_and_fits():
    for m, c in [(25088, 4096), (12544, 4096), (25088, 512), (8, 512),
                 (64, 128), (4096, 4096)]:
        t = _row_block(m, c)
        assert t % 8 == 0 and m % t == 0
        # u32 bits + f32 keep + temps stay in the scoped-VMEM budget
        assert t * c * 4 <= 4 * 2 ** 20


def test_drop_module_sites_draw_independent_masks():
    """The four Drop sites in a TransformerBlock fold distinct rng paths:
    two calls at the same rate in one apply must not share a mask."""
    from gdl_tpu.models.transformer import FeedForward

    m = FeedForward(dim=128, hidden_dim=128, dropout_rate=0.5)
    x = jnp.ones((2, 8, 128))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, True)
    # identity weights so both dropout sites act on comparable tensors
    y1 = m.apply(v, x, True, rngs={"dropout": jax.random.PRNGKey(2)})
    y2 = m.apply(v, x, True, rngs={"dropout": jax.random.PRNGKey(2)})
    y3 = m.apply(v, x, True, rngs={"dropout": jax.random.PRNGKey(3)})
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert (np.asarray(y1) != np.asarray(y3)).any()
