"""UNet1D: the 1-D spike-segmentation U-Net, pure-functional JAX.

Behavioral mirror of the reference Keras builder ``unet1d``
(``models/spikes/unet_1d_segmentation.py:49-148``):

- Input (B, T) -> channel dim added (:87).
- conv block = Conv1D(k=5, SAME) -> BN -> ReLU (:81-84); filter schedule
  32..512 with MaxPool1D(2) on the way down, dropout base 0.05 (x2 deeper).
- Up path uses weight-free UpSampling1D (repeat x2, :78-79) — unlike the 2-D
  net there are NO transpose convs.
- Head: Conv1D(2, 1) -> MaxPool1D(margin+1, stride 1, SAME) -> softmax ->
  channel -1 (:139-145). The pre-softmax max-pool implements the ±margin/2
  temporal error tolerance (:61-63).

Fully convolutional over T (multiple of 16), so full-length trace inference
needs no model rebuild (reference ``:452-455`` reloads the model per trace
length via the HDF5 shape rewrite).
"""

import functools

import jax
import jax.numpy as jnp

from deepcalcium_tpu.models import blocks as B

_F = 32


def layer_order(nfb: int = _F):
    f = nfb
    order = []

    def cbr(name, cout):
        order.append((f"{name}_conv", "conv5", cout))
        order.append((f"{name}_bn", "bn", cout))

    cbr("enc0a", f)
    cbr("enc0b", f)
    cbr("enc1a", f * 2)
    cbr("enc1b", f * 2)
    cbr("enc2a", f * 4)
    cbr("enc2b", f * 4)
    cbr("enc3a", f * 8)
    cbr("enc3b", f * 8)
    cbr("mida", f * 16)
    cbr("midb", f * 16)
    cbr("dec3a", f * 8)
    cbr("dec3b", f * 8)
    cbr("dec2a", f * 4)
    cbr("dec2b", f * 4)
    cbr("dec1a", f * 2)
    cbr("dec1b", f * 2)
    cbr("dec0a", f)
    cbr("dec0b", f)
    order.append(("head_conv", "conv1", 2))
    return order


LAYER_ORDER = layer_order()

# Channel counts arriving at each post-concat conv: [up, skip] with the up
# branch NOT reduced by a transpose conv (UpSampling keeps channels).
_CONCAT_CIN = {
    "dec3a_conv": (16, 8),  # x f
    "dec2a_conv": (8, 4),
    "dec1a_conv": (4, 2),
    "dec0a_conv": (2, 1),
}


def init(key, nfb: int = _F):
    params, state = {}, {}
    cin = 1
    for name, kind, cout in layer_order(nfb):
        key, sub = jax.random.split(key)
        if kind == "conv5":
            params[name] = B.init_conv1d(sub, 5, cin, cout)
            cin = cout
        elif kind == "conv1":
            params[name] = B.init_conv1d(sub, 1, cin, cout)
            cin = cout
        elif kind == "bn":
            params[name], state[name] = B.init_bn(cout)
    # Fix the post-concat fan-ins: input = (up_mul + skip_mul) * nfb.
    for name, (up_mul, skip_mul) in _CONCAT_CIN.items():
        key, sub = jax.random.split(key)
        cout = skip_mul * nfb
        params[name] = B.init_conv1d(sub, 5, (up_mul + skip_mul) * nfb, cout)
    return params, state


def apply(params, state, x, train: bool = False, rng=None, drp: float = 0.05,
          margin: int = 4, compute_dtype=None, precision=None):
    """Forward pass: (B, T) traces -> (B, T) spike probabilities."""
    if train and rng is None:
        raise ValueError("training forward requires rng for dropout")
    dt = compute_dtype
    new_state = dict(state)
    rngs = iter(jax.random.split(rng, 16)) if rng is not None else None

    def cbr(name, h):
        y = B.conv1d(h, params[f"{name}_conv"], dtype=dt, precision=precision)
        y, s = B.batch_norm(y, params[f"{name}_bn"], state[f"{name}_bn"], train, 0.99)
        new_state[f"{name}_bn"] = s
        return jax.nn.relu(y)

    def drop(h, rate):
        return B.dropout(h, rate, train, next(rngs) if rngs else None)

    def pool(h):
        # Dense-grad window-2 max (== reduce_window forward AND backward
        # incl. tie routing; avoids select_and_scatter — blocks.pool2_axis).
        return B.pool2_axis(h, 1)

    h = x[..., None].astype(dt or x.dtype)

    h = cbr("enc0b", cbr("enc0a", h))
    skip0 = h
    h = pool(h)
    h = drop(cbr("enc1b", cbr("enc1a", h)), drp)
    skip1 = h
    h = pool(h)
    h = drop(cbr("enc2b", cbr("enc2a", h)), drp * 2)
    skip2 = h
    h = pool(h)
    h = drop(cbr("enc3b", cbr("enc3a", h)), drp * 2)
    skip3 = h
    h = pool(h)

    h = cbr("midb", cbr("mida", h))
    h = drop(B.upsample1d(h), drp * 2)

    h = jnp.concatenate([h, skip3], axis=-1)
    h = cbr("dec3b", cbr("dec3a", h))
    h = drop(B.upsample1d(h), drp * 2)

    h = jnp.concatenate([h, skip2], axis=-1)
    h = cbr("dec2b", cbr("dec2a", h))
    h = drop(B.upsample1d(h), drp * 2)

    h = jnp.concatenate([h, skip1], axis=-1)
    h = cbr("dec1b", cbr("dec1a", h))
    h = drop(B.upsample1d(h), drp)

    h = jnp.concatenate([h, skip0], axis=-1)
    h = cbr("dec0b", cbr("dec0a", h))

    logits = B.conv1d(h, params["head_conv"], dtype=dt, precision=precision)
    # ±margin tolerance: max-pool the 2-ch logits pre-softmax (:139-141).
    logits = B.maxpool1d(logits.astype(jnp.float32), margin + 1, 1, "SAME")
    probs = jax.nn.softmax(logits, axis=-1)[..., -1]
    return probs, new_state


@functools.partial(jax.jit, static_argnames=("margin", "compute_dtype", "precision"))
def infer(params, state, x, margin=4, compute_dtype=None, precision=None):
    probs, _ = apply(params, state, x, train=False, margin=margin,
                     compute_dtype=compute_dtype, precision=precision)
    return probs


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def forward_flops(t: int, nfb: int = _F) -> int:
    """Analytic FLOPs (2·MACs) of ONE forward pass on one length-``t``
    trace. Counts the conv matmuls only — BN, ReLU, pooling, upsampling,
    softmax and the margin max-pool are bandwidth-bound elementwise ops.
    Mirrors :func:`apply`; used by bench.py for 1-D train TFLOP/s + MFU
    accounting (counterpart of ``unet2d.forward_flops``).
    """
    assert t % 16 == 0, t
    f = nfb
    fl = 0

    def conv(tt, k, cin, cout):
        nonlocal fl
        fl += 2 * k * cin * cout * tt

    # Encoder + bottleneck: conv pairs with the filter doubling, T halving.
    tt = t
    enc = [(1, f), (f, 2 * f), (2 * f, 4 * f), (4 * f, 8 * f),
           (8 * f, 16 * f)]
    for i, (cin, cout) in enumerate(enc):
        conv(tt, 5, cin, cout)
        conv(tt, 5, cout, cout)
        if i < len(enc) - 1:
            tt //= 2
    # Decoder: weight-free UpSampling1D keeps the up branch's channels, so
    # dec*a consumes (cup + cout) concatenated channels (see _CONCAT_CIN).
    cup = 16 * f
    for cout in (8 * f, 4 * f, 2 * f, f):
        tt *= 2
        conv(tt, 5, cup + cout, cout)
        conv(tt, 5, cout, cout)
        cup = cout
    conv(t, 1, f, 2)  # head
    return fl
