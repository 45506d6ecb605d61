import jax
import jax.numpy as jnp
import numpy as np

from chap_tpu.models.enet import ENet
from chap_tpu.models.pnet import PNet2D
from chap_tpu.models.discriminator import FC3DDiscriminator, FCDiscriminator
from chap_tpu.models.grl import gradient_reverse, warm_start_coeff


def test_pnet_forward():
    model = PNet2D(num_classes=4, num_filters=16)
    x = jnp.zeros((1, 64, 64, 1))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 64, 64, 4)


def test_enet_forward_and_train():
    model = ENet(num_classes=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 1))
    v = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 64, 64, 4)
    out2, _ = model.apply(v, x, train=True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(2)})
    assert out2.shape == (1, 64, 64, 4)


def test_discriminators():
    d3 = FC3DDiscriminator(num_classes=2)
    seg = jnp.zeros((2, 32, 32, 16, 2))
    img = jnp.zeros((2, 32, 32, 16, 1))
    v = d3.init({"params": jax.random.PRNGKey(0)}, seg, img)
    out = d3.apply(v, seg, img)
    assert out.shape == (2, 2)

    d2 = FCDiscriminator(num_classes=4)
    x = jnp.zeros((2, 64, 64, 4))
    v = d2.init({"params": jax.random.PRNGKey(0)}, x)
    out = d2.apply(v, x)
    assert out.shape == (2, 2, 2, 1)


def test_gradient_reverse():
    def f(x):
        return jnp.sum(gradient_reverse(x, jnp.float32(0.5)) ** 2)

    x = jnp.ones((3,))
    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), -0.5 * 2 * np.ones(3), rtol=1e-6)
    assert float(warm_start_coeff(0)) == 0.0
    assert 0 < float(warm_start_coeff(500, max_iters=1000)) < 1.0


def test_fmeasure():
    from chap_tpu.metrics.fmeasure import fmeasure_calu
    pred = np.zeros((8, 8)); pred[:4] = 1
    gt = np.zeros((8, 8)); gt[:4] = 1
    p, r, s, dice, f, iou = fmeasure_calu(pred, gt)
    assert dice == 1.0 and f == 1.0 and iou == 1.0
    assert fmeasure_calu(np.zeros((8, 8)), gt) == (0, 0, 0, 0, 0, 0)


def test_swin_unet_forward():
    from chap_tpu.models.swin_unet import SwinUNet
    model = SwinUNet(num_classes=4, img_size=64, embed_dim=24,
                     depths=(2, 2, 2), num_heads=(2, 4, 8), window_size=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 1))
    v = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 64, 64, 4)


def test_swin_unet_shifted_windows():
    from chap_tpu.models.swin_unet import SwinUNet
    # resolution > window so SW-MSA masks actually engage
    model = SwinUNet(num_classes=2, img_size=64, embed_dim=12,
                     depths=(2, 2), num_heads=(2, 2), window_size=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 1))
    v = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_resvnet_forward():
    from chap_tpu.models.resvnet import ResVNet
    model = ResVNet(num_classes=2)
    x = jnp.zeros((1, 32, 32, 16, 1))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    logits, mid = model.apply(v, x, train=False)
    assert logits.shape == (1, 32, 32, 16, 2)


def test_unet3d_dv_semi_forward():
    from chap_tpu.models.unet3d_dv import UNet3DDvSemi
    model = UNet3DDvSemi(num_classes=2)
    x = jnp.zeros((1, 32, 32, 32, 1))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    outs = model.apply(v, x, train=False)
    assert len(outs) == 4
    for o in outs:
        assert o.shape == (1, 32, 32, 32, 2)


def test_efficient_unet_forward():
    from chap_tpu.models.efficientunet import EffiUNet
    model = EffiUNet(num_classes=4)
    x = jnp.zeros((1, 64, 64, 1))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 64, 64, 4)


def test_mask_transformer_decoder():
    from chap_tpu.models.transformer_decoder import MaskTransformerDecoder
    dec = MaskTransformerDecoder(num_queries=4, hidden_dim=32, num_layers=4,
                                 num_heads=4)
    feats = [jnp.zeros((2, 8, 8, 16)), jnp.zeros((2, 16, 16, 8))]
    v = dec.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    segs, attns = dec.apply(v, feats, train=False)
    assert len(segs) == 4
    assert segs[0].shape == (2, 4, 8, 8)     # level 0
    assert segs[1].shape == (2, 4, 16, 16)   # level 1
    assert attns[0].shape == (2, 4, 8, 8)


def test_aux_blocks():
    from chap_tpu.models.blocks import SqEx, SEBlock3d, SCSEModule, Conv2dReLU
    x2 = jnp.ones((1, 8, 8, 32))
    x3 = jnp.ones((1, 4, 4, 4, 32))
    for mod, x in [(SqEx(), x3), (SEBlock3d(), x3), (SCSEModule(), x2)]:
        v = mod.init(jax.random.PRNGKey(0), x)
        assert mod.apply(v, x).shape == x.shape
    m = Conv2dReLU(16)
    v = m.init(jax.random.PRNGKey(0), x2, train=False)
    out = m.apply(v, x2, train=False)
    assert out.shape == (1, 8, 8, 16)


def test_timing_harness():
    from chap_tpu.utils.timing import benchmark_fwd_bwd, param_count
    from chap_tpu.models.unet2d import UNet
    model = UNet(num_classes=2, feature_chns=(2, 4, 8, 8, 16))
    stats = benchmark_fwd_bwd(model, jnp.zeros((1, 32, 32, 1)), num_iters=2)
    assert stats["fwd_ms"] > 0 and stats["fwd_bwd_ms"] > 0
    assert stats["params"] > 0


def test_kmax_transformer_decoder():
    from chap_tpu.models.transformer_decoder import KMaxTransformerDecoder
    dec = KMaxTransformerDecoder(num_queries=4, hidden_dim=32, num_layers=2,
                                 num_heads=4)
    feats = [jnp.zeros((2, 8, 8, 16))]
    v = dec.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    segs = dec.apply(v, feats, train=False)
    assert len(segs) == 2
    assert segs[0].shape == (2, 4, 8, 8)
    # gradient flows through the straight-through assignment
    def loss(p):
        return jnp.sum(dec.apply(p, [jnp.ones((1, 8, 8, 16))], train=False)[0])
    g = jax.grad(lambda p: loss(p))(v)
    assert np.isfinite(jax.tree.leaves(jax.tree.map(
        lambda x: np.abs(np.asarray(x)).sum(), g["params"]))[0])
