"""UNet2DS functional model: shapes, semantics vs torch oracles, polymorphism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepcalcium_tpu.models import blocks as B
from deepcalcium_tpu.models import unet2d


@pytest.fixture(scope="module")
def small_net():
    params, state = unet2d.init(jax.random.PRNGKey(0), nfb=4)
    return params, state


def test_output_shape_and_range(small_net):
    params, state = small_net
    x = np.random.default_rng(0).standard_normal((2, 32, 32)).astype(np.float32)
    probs, _ = unet2d.apply(params, state, x)
    assert probs.shape == (2, 32, 32)
    p = np.asarray(probs)
    assert p.min() >= 0 and p.max() <= 1


def test_fully_convolutional_polymorphism(small_net):
    """One apply fn serves any H=W divisible by 16 — replaces the reference's
    per-shape model rebuild (keras_helpers.py:24-68)."""
    params, state = small_net
    for hw in (32, 64, 96):
        x = np.zeros((1, hw, hw), np.float32)
        probs, _ = unet2d.apply(params, state, x)
        assert probs.shape == (1, hw, hw)


def test_param_count_full_size():
    """Filter schedule sanity: the 32-base net should be ~7.8M params
    (reference UNet2DS ≈ 8M)."""
    params, _ = unet2d.init(jax.random.PRNGKey(0), nfb=32)
    n = unet2d.param_count(params)
    assert 7_000_000 < n < 9_000_000, n


def test_train_updates_bn_state(small_net):
    params, state = small_net
    x = np.random.default_rng(1).standard_normal((4, 32, 32)).astype(np.float32)
    _, new_state = unet2d.apply(params, state, x, train=True, rng=jax.random.PRNGKey(2))
    diffs = [
        float(jnp.abs(new_state[k]["mean"] - state[k]["mean"]).max())
        for k in state
    ]
    assert max(diffs) > 0


def test_eval_deterministic_train_stochastic(small_net):
    params, state = small_net
    x = np.random.default_rng(2).standard_normal((2, 32, 32)).astype(np.float32)
    p1, _ = unet2d.apply(params, state, x)
    p2, _ = unet2d.apply(params, state, x)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    t1, _ = unet2d.apply(params, state, x, train=True, rng=jax.random.PRNGKey(1))
    t2, _ = unet2d.apply(params, state, x, train=True, rng=jax.random.PRNGKey(3))
    assert not np.array_equal(np.asarray(t1), np.asarray(t2))


def test_conv2d_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 9, 11, 3)).astype(np.float32)
    k = rng.standard_normal((3, 3, 3, 5)).astype(np.float32)
    b = rng.standard_normal((5,)).astype(np.float32)
    got = np.asarray(B.conv2d(
        jnp.asarray(x), {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)},
        precision=jax.lax.Precision.HIGHEST))
    with torch.no_grad():
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        kt = torch.tensor(k).permute(3, 2, 0, 1)
        want = torch.nn.functional.conv2d(xt, kt, torch.tensor(b), padding=1)
        want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_tconv_matches_torch():
    """The einsum transpose-conv must equal ConvTranspose2d(k=2, s=2).

    Keras Conv2DTranspose kernels are (kh, kw, out, in); torch wants
    (in, out, kh, kw)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 7, 5, 6)).astype(np.float32)
    k = rng.standard_normal((2, 2, 4, 6)).astype(np.float32)  # HWOI
    b = rng.standard_normal((4,)).astype(np.float32)
    got = np.asarray(B.tconv2x2(
        jnp.asarray(x), {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)},
        precision=jax.lax.Precision.HIGHEST))
    with torch.no_grad():
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        kt = torch.tensor(k).permute(3, 2, 0, 1)  # (in, out, kh, kw)
        want = torch.nn.functional.conv_transpose2d(xt, kt, torch.tensor(b), stride=2)
        want = want.permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape == (2, 14, 10, 4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batchnorm_matches_torch_eval():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 6, 6, 3)).astype(np.float32)
    gamma = rng.standard_normal((3,)).astype(np.float32)
    beta = rng.standard_normal((3,)).astype(np.float32)
    mean = rng.standard_normal((3,)).astype(np.float32)
    var = rng.random((3,)).astype(np.float32) + 0.5
    got, _ = B.batch_norm(
        jnp.asarray(x),
        {"gamma": jnp.asarray(gamma), "beta": jnp.asarray(beta)},
        {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
        train=False, momentum=0.99,
    )
    with torch.no_grad():
        bn = torch.nn.BatchNorm2d(3, eps=1e-3)
        bn.weight.copy_(torch.tensor(gamma))
        bn.bias.copy_(torch.tensor(beta))
        bn.running_mean.copy_(torch.tensor(mean))
        bn.running_var.copy_(torch.tensor(var))
        bn.eval()
        want = bn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_bn_train_stat_update_semantics():
    """moving = 0.99 * moving + 0.01 * batch (Keras momentum convention)."""
    rng = np.random.default_rng(6)
    x = rng.standard_normal((8, 4, 4, 2)).astype(np.float32) * 3 + 1
    p = {"gamma": jnp.ones(2), "beta": jnp.zeros(2)}
    s = {"mean": jnp.zeros(2), "var": jnp.ones(2)}
    _, new_s = B.batch_norm(jnp.asarray(x), p, s, train=True, momentum=0.99)
    bm = x.reshape(-1, 2).mean(0)
    bv = x.reshape(-1, 2).var(0)
    np.testing.assert_allclose(np.asarray(new_s["mean"]), 0.01 * bm, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(new_s["var"]), 0.99 + 0.01 * bv, rtol=1e-4)


def test_bfloat16_compute_close_to_f32(small_net):
    params, state = small_net
    x = np.random.default_rng(7).standard_normal((1, 32, 32)).astype(np.float32)
    p32, _ = unet2d.apply(params, state, x)
    pbf, _ = unet2d.apply(params, state, x, compute_dtype=jnp.bfloat16)
    assert np.abs(np.asarray(p32) - np.asarray(pbf)).max() < 0.1


def test_gradients_flow(small_net):
    params, state = small_net
    x = np.random.default_rng(8).standard_normal((2, 32, 32)).astype(np.float32)
    yt = (np.random.default_rng(9).random((2, 32, 32)) > 0.9).astype(np.float32)

    def loss_fn(p):
        probs, _ = unet2d.apply(p, state, x, train=True, rng=jax.random.PRNGKey(0))
        return jnp.mean((probs - yt) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_upsampling_mode():
    """The reference's upsampling_or_transpose='upsampling' variant
    (unet_2d_summary.py:154-161): weight-free up path, larger concat
    fan-in."""
    params, state = unet2d.init(jax.random.PRNGKey(0), nfb=4, up_mode="upsampling")
    assert "up3_tconv" not in params
    probs, _ = unet2d.apply(params, state,
                            np.zeros((1, 32, 32), np.float32),
                            up_mode="upsampling")
    assert probs.shape == (1, 32, 32)


def test_remat_matches_plain(small_net):
    """jax.checkpoint rematerialization must not change outputs or grads."""
    params, state = small_net
    x = np.random.default_rng(11).standard_normal((2, 32, 32)).astype(np.float32)
    yt = (np.random.default_rng(12).random((2, 32, 32)) > 0.9).astype(np.float32)

    p1, _ = unet2d.apply(params, state, x)
    p2, _ = unet2d.apply(params, state, x, remat=True)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)

    def loss(p, remat):
        probs, _ = unet2d.apply(p, state, x, train=True,
                                rng=jax.random.PRNGKey(0), remat=remat)
        return jnp.mean((probs - yt) ** 2)

    g1 = jax.grad(lambda p: loss(p, False))(params)
    g2 = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_kernel_init_keras206_truncated_normal():
    """Keras-2.0.6 VarianceScaling draws a ±2σ TRUNCATED normal with NO
    truncation-variance compensation (the 1/0.87962 stddev correction is a
    later-Keras 2.2.x change). The reference pins Keras 2.0.6
    (reference requirements.txt), so the *_normal schemes must be hard-
    bounded at ±2·stddev and land at sample std ≈ 0.8796·stddev."""
    fan_in, fan_out = 288, 64
    shape = (200, 1000)
    for scheme, stddev in (
            ("he_normal", np.sqrt(2.0 / fan_in)),
            ("glorot_normal", np.sqrt(2.0 / (fan_in + fan_out)))):
        k = np.asarray(B.kernel_init(jax.random.PRNGKey(11), shape,
                                     fan_in, fan_out, scheme))
        assert np.abs(k).max() <= 2.0 * stddev * (1 + 1e-6), scheme
        # Uncompensated truncation: std shrinks by the 0.87962 factor.
        np.testing.assert_allclose(k.std(), 0.87962 * stddev,
                                   rtol=0.02, err_msg=scheme)
        assert abs(k.mean()) < 0.05 * stddev, scheme


def test_kernel_init_uniform_bounds():
    """Uniform schemes: exact Keras limits, untouched by the truncation fix."""
    fan_in, fan_out = 288, 64
    shape = (200, 1000)
    for scheme, lim in (("he_uniform", np.sqrt(6.0 / fan_in)),
                        ("glorot_uniform", np.sqrt(6.0 / (fan_in + fan_out)))):
        k = np.asarray(B.kernel_init(jax.random.PRNGKey(12), shape,
                                     fan_in, fan_out, scheme))
        assert np.abs(k).max() <= lim, scheme
        # A uniform on [-lim, lim] has std lim/sqrt(3).
        np.testing.assert_allclose(k.std(), lim / np.sqrt(3.0),
                                   rtol=0.02, err_msg=scheme)


def test_maxpool2_dense_grad_matches_reduce_window():
    """maxpool2's dense backward must equal select_and_scatter routing
    (first maximal element per 2x2 window, ROW-MAJOR order) exactly —
    including tied windows, which ReLU'd activations produce constantly.
    Includes the (1,2;2,0) case that a cascade of two 2-element pools
    routes wrongly (column winner instead of the row-major first max)."""
    import numpy as np

    from deepcalcium_tpu.models import blocks as B

    def ref(z):
        return jax.lax.reduce_window(z, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    z = jnp.maximum(z, 0.0)  # realistic: many exact zero ties
    z = z.at[0, 0, 0, 0].set(1.0).at[0, 0, 1, 0].set(2.0)
    z = z.at[0, 1, 0, 0].set(2.0).at[0, 1, 1, 0].set(0.0)

    o_ref, vjp_ref = jax.vjp(ref, z)
    o_new, vjp_new = jax.vjp(B.maxpool2, z)
    np.testing.assert_array_equal(np.asarray(o_ref), np.asarray(o_new))
    ct = jnp.asarray(rng.standard_normal(o_ref.shape), jnp.float32)
    np.testing.assert_array_equal(np.asarray(vjp_ref(ct)[0]),
                                  np.asarray(vjp_new(ct)[0]))

def test_dropout_remat_bwd_bitwise_equal():
    """The remat-backward dropout (blocks.DROPOUT_REMAT_BWD) must be
    bitwise-identical to the residual form in BOTH passes: same key ->
    same bernoulli draw, so redrawing the mask in the backward changes
    only the HLO XLA sees, never a value. Flag is read at trace time —
    build a fresh jitted step per setting."""
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 16),
                          jnp.bfloat16)

    def run(flag):
        old = B.DROPOUT_REMAT_BWD
        B.DROPOUT_REMAT_BWD = flag
        try:
            def f(x):
                y = B.dropout(x, 0.25, True, key).astype(jnp.float32)
                return jnp.sum(jnp.sin(y))
            return jax.jit(jax.value_and_grad(f))(x)
        finally:
            B.DROPOUT_REMAT_BWD = old

    v0, g0 = run(False)
    v1, g1 = run(True)
    assert v0 == v1
    np.testing.assert_array_equal(np.asarray(g0, np.float32),
                                  np.asarray(g1, np.float32))
