"""Model + converter parity tests: torch oracles (tests/torch_oracle.py,
matching reference models.py semantics) vs our NHWC functional models,
wired through the real torch->JAX converter."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fastdepth_tpu.checkpoint import convert as C
from fastdepth_tpu.checkpoint.io import numpy_to_jax
from fastdepth_tpu.config import (
    FASTDEPTH_PRUNED,
    FASTDEPTH_UNPRUNED,
    ModelConfig,
)
from fastdepth_tpu.models import build, from_name

from torch_oracle import (
    TorchFastDepth,
    TorchMobileNetClassifier,
    TorchResNetEncoder,
    randomize_bn_stats,
)

# tiny 14-entry channel lists keep tests fast; skip-add needs
# dec[1]==enc[5], dec[2]==enc[3], dec[3]==enc[1]
TINY_ENC = (4, 6, 8, 10, 12, 14, 16, 16, 16, 16, 16, 16, 20, 24)
TINY_DEC_ADD = (18, 14, 10, 6, 4)
TINY_DEC = (18, 12, 10, 6, 4)


def _state_dict_np(model):
    return {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}


@pytest.mark.parametrize("skip", ["add", "concat"])
def test_fastdepth_matches_torch_oracle(skip):
    gen = torch.Generator().manual_seed(0)
    dec = TINY_DEC_ADD if skip == "add" else TINY_DEC
    tm = TorchFastDepth(TINY_ENC, dec, skip=skip).eval()
    randomize_bn_stats(tm, gen)

    x = torch.randn(2, 3, 64, 64, generator=gen)
    with torch.no_grad():
        ref = tm(x).numpy()

    params, cfg = C.convert_fastdepth_skip(_state_dict_np(tm), skip=skip)
    assert cfg.encoder_channels == TINY_ENC
    assert cfg.decoder_channels == tuple(dec)
    model = build(cfg)
    out = model.apply(numpy_to_jax(params), jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ref, got, atol=2e-4)


def test_fastdepth_randomized_widths_converter_parity():
    """Converter channel inference at ARBITRARY widths: random (odd,
    non-lane-aligned) per-layer channel lists through the torch oracle
    -> convert -> forward parity.  The fixed tiny/full-width parity
    tests pin two points; NetAdapt-style pruning makes every width
    legal, so inference must not carry hidden alignment assumptions."""
    wrng = np.random.RandomState(11)
    for trial in range(4):
        skip = ("add", "concat", None, "add")[trial]
        enc = [int(wrng.randint(3, 15))]
        for _ in range(13):
            enc.append(int(wrng.randint(3, 23)))
        if skip is None:
            from torch_oracle import TorchMobileNetNNConv

            dec = [int(wrng.randint(3, 19)) for _ in range(5)]
            gen = torch.Generator().manual_seed(100 + trial)
            tm = TorchMobileNetNNConv(enc, dec, dw=True).eval()
            randomize_bn_stats(tm, gen)
            params, cfg = C.convert_mobilenet_plain(_state_dict_np(tm))
        else:
            # skip-add constrains dec[1:4] to the tap widths (reference
            # models.py:720-729); concat leaves them free
            if skip == "add":
                dec = [int(wrng.randint(3, 19)), enc[5], enc[3], enc[1],
                       int(wrng.randint(3, 19))]
            else:
                dec = [int(wrng.randint(3, 19)) for _ in range(5)]
            gen = torch.Generator().manual_seed(100 + trial)
            tm = TorchFastDepth(enc, dec, skip=skip).eval()
            randomize_bn_stats(tm, gen)
            params, cfg = C.convert_fastdepth_skip(_state_dict_np(tm), skip=skip)
        assert cfg.encoder_channels == tuple(enc), (trial, skip)
        assert cfg.decoder_channels == tuple(dec), (trial, skip)
        x = torch.randn(1, 3, 64, 64, generator=gen)
        with torch.no_grad():
            ref = tm(x).numpy()
        model = build(cfg)
        out = model.apply(numpy_to_jax(params),
                          jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            ref, np.asarray(out).transpose(0, 3, 1, 2), atol=2e-4,
            err_msg=f"trial {trial} skip={skip} enc={enc} dec={dec}")


def test_fastdepth_folded_matches_unfolded():
    gen = torch.Generator().manual_seed(1)
    tm = TorchFastDepth(TINY_ENC, TINY_DEC_ADD, skip="add").eval()
    randomize_bn_stats(tm, gen)
    params, cfg = C.convert_fastdepth_skip(_state_dict_np(tm), skip="add")
    model = build(cfg)
    p = numpy_to_jax(params)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32))
    y0 = model.apply(p, x)
    y1 = model.apply(model.fold(p), x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4)


def test_imagenet_mobilenet_classifier_matches_torch():
    gen = torch.Generator().manual_seed(2)
    tm = TorchMobileNetClassifier(TINY_ENC, classes=10, pool=2).eval()
    randomize_bn_stats(tm, gen)
    x = torch.randn(2, 3, 64, 64, generator=gen)
    with torch.no_grad():
        ref = tm(x).numpy()

    enc, head, channels = C.convert_imagenet_mobilenet(_state_dict_np(tm))
    assert tuple(channels) == TINY_ENC

    from fastdepth_tpu.models import mobilenet as MN

    feats, _ = MN.apply_encoder(numpy_to_jax(enc), jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    logits = MN.apply_classifier(numpy_to_jax(head), feats)
    np.testing.assert_allclose(ref, np.asarray(logits), atol=2e-4)


def test_imagenet_classifier_topk_matches_torch_harness():
    """Top-1/top-5 eval differential vs the torch ImageNet-harness
    convention (the reference's best_prec1, imagenet/mobilenet.py:65-76):
    converted-checkpoint logits must pick the same classes AND yield the
    same accuracy fractions as torch.topk on the torch head's logits."""
    gen = torch.Generator().manual_seed(4)
    tm = TorchMobileNetClassifier(TINY_ENC, classes=10, pool=2).eval()
    randomize_bn_stats(tm, gen)
    x = torch.randn(16, 3, 64, 64, generator=gen)
    labels = torch.randint(0, 10, (16,), generator=gen)
    with torch.no_grad():
        ref_logits = tm(x)
    _, ref_top5 = torch.topk(ref_logits, 5, dim=1)
    ref_acc = {
        k: (ref_top5[:, :k] == labels[:, None]).any(dim=1).float().mean().item()
        for k in (1, 5)
    }

    from fastdepth_tpu.models import mobilenet as MN

    enc, head, _ = C.convert_imagenet_mobilenet(_state_dict_np(tm))
    feats, _ = MN.apply_encoder(
        numpy_to_jax(enc), jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    logits = MN.apply_classifier(numpy_to_jax(head), feats)
    acc = MN.classifier_topk(logits, jnp.asarray(labels.numpy()))
    # same argmax classes (converted logits match to 2e-4; random logits
    # are never that close to tied)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(logits, axis=1)),
        ref_logits.argmax(dim=1).numpy())
    for k in (1, 5):
        np.testing.assert_allclose(float(acc[k]), ref_acc[k], err_msg=f"top{k}")


def test_resnet18_encoder_matches_torch_oracle():
    tv = TorchResNetEncoder(18).eval()
    gen = torch.Generator().manual_seed(3)
    randomize_bn_stats(tv, gen)
    x = torch.randn(1, 3, 64, 64, generator=gen)
    feats_t = {}
    with torch.no_grad():
        feats_t["x1"], feats_t["x6"] = tv(x)

    sd = {k: v.detach().numpy() for k, v in tv.state_dict().items()}
    params = C.convert_resnet_encoder(sd, 18)

    from fastdepth_tpu.models import resnet as RN

    out, taps = RN.apply_resnet_encoder(
        numpy_to_jax(params), jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), 18
    )
    np.testing.assert_allclose(
        feats_t["x1"].numpy(), np.asarray(taps[0]).transpose(0, 3, 1, 2), atol=2e-4
    )
    np.testing.assert_allclose(
        feats_t["x6"].numpy(), np.asarray(out).transpose(0, 3, 1, 2), atol=2e-4
    )


def test_resnet50_encoder_matches_torch_oracle():
    tv = TorchResNetEncoder(50).eval()
    gen = torch.Generator().manual_seed(4)
    randomize_bn_stats(tv, gen)
    x = torch.randn(1, 3, 64, 64, generator=gen)
    with torch.no_grad():
        _, y = tv(x)

    sd = {k: v.detach().numpy() for k, v in tv.state_dict().items()}
    from fastdepth_tpu.models import resnet as RN

    out, _ = RN.apply_resnet_encoder(
        numpy_to_jax(C.convert_resnet_encoder(sd, 50)),
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), 50,
    )
    np.testing.assert_allclose(y.numpy(), np.asarray(out).transpose(0, 3, 1, 2), atol=5e-4)


def test_pruned_config_channels():
    """The recovered NetAdapt architecture (SURVEY.md §2) is expressible
    and self-consistent."""
    m = build(FASTDEPTH_PRUNED)
    p = m.init(jax.random.PRNGKey(0))
    assert p["encoder"]["conv0"]["w"].shape == (3, 3, 3, 16)
    assert p["encoder"]["conv13"]["pw"]["w"].shape == (1, 1, 480, 512)
    assert p["decoder"]["decode_conv1"]["pw"]["w"].shape == (1, 1, 512, 200)
    assert p["decoder"]["decode_conv6"]["pw"]["w"].shape == (1, 1, 16, 1)


def test_from_name_parsing():
    for name, enc0, dec in [
        ("mobilenet-nnconv5dw-skipadd", 32, "nnconv5dw"),
        ("mobilenet-nnconv5dw-skipadd-pruned", 16, "nnconv5dw"),
        ("mobilenet-nnconv5", 32, "nnconv5"),
    ]:
        m = from_name(name)
        assert m.config.encoder_channels[0] == enc0
        assert m.config.decoder == dec
    assert from_name("mobilenet-nnconv5dw-skipadd-pruned").config.skip == "add"
    assert from_name("mobilenet-nnconv5").config.skip is None


@pytest.mark.parametrize(
    "decoder", ["nnconv3", "blconv5dw", "deconv3", "deconv5dw", "upconv", "upproj", "shuffle3"]
)
def test_decoder_family_output_shapes(decoder):
    # shuffle halves channels 4x per stage, so it needs the encoder to end
    # at a multiple of 4^5 (the reference hardcodes 1024, models.py:296-333)
    enc = TINY_ENC[:-1] + (1024,) if decoder.startswith("shuffle") else TINY_ENC
    cfg = ModelConfig(
        decoder=decoder, skip=None,
        encoder_channels=enc, decoder_channels=TINY_DEC,
    )
    m = build(cfg)
    p = m.init(jax.random.PRNGKey(0))
    y = m.apply(p, jnp.zeros((1, 64, 64, 3)))
    assert y.shape == (1, 64, 64, 1)


def test_pruned_checkpoint_roundtrip_real_shapes():
    """Converter + forward parity at the TRUE NetAdapt-pruned channel
    lists (SURVEY.md §2 reconstruction) — the architecture that exists
    only inside a pickle in the reference release."""
    from fastdepth_tpu.config import (
        PRUNED_DECODER_CHANNELS,
        PRUNED_ENCODER_CHANNELS,
    )

    gen = torch.Generator().manual_seed(9)
    tm = TorchFastDepth(
        PRUNED_ENCODER_CHANNELS, PRUNED_DECODER_CHANNELS, skip="add"
    ).eval()
    randomize_bn_stats(tm, gen)
    x = torch.randn(1, 3, 224, 224, generator=gen)
    with torch.no_grad():
        ref = tm(x).numpy()

    params, cfg = C.convert_fastdepth_skip(_state_dict_np(tm), skip="add")
    assert cfg == FASTDEPTH_PRUNED
    model = build(cfg)
    out = model.apply(
        numpy_to_jax(params), jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        ref, np.asarray(out).transpose(0, 3, 1, 2), atol=5e-4
    )


@pytest.mark.parametrize("skip", ["add", "concat"])
def test_resnet_skip_full_forward_matches_torch(skip):
    """Full ResNetSkip{Add,Concat} forward + converter parity vs a torch
    oracle (reference models.py:462-652 orderings, incl. the stage-5
    add-before-conv quirk)."""
    from torch_oracle import TorchResNetSkip

    gen = torch.Generator().manual_seed(6)
    tm = TorchResNetSkip(18, skip=skip).eval()
    randomize_bn_stats(tm, gen)
    x = torch.randn(1, 3, 64, 64, generator=gen)
    with torch.no_grad():
        ref = tm(x).numpy()

    sd = _state_dict_np(tm)
    params, cfg = C.convert_resnet_depth(sd, skip=skip)
    assert cfg.encoder == "resnet18" and cfg.skip == skip
    out = build(cfg).apply(
        numpy_to_jax(params), jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        ref, np.asarray(out).transpose(0, 3, 1, 2), atol=5e-4
    )


def test_resnet_skip_sniff_dispatch(tmp_path):
    """convert_checkpoint structure-sniffs pickled resnet skip models."""
    from torch_oracle import TorchResNetSkip

    gen = torch.Generator().manual_seed(7)
    tm = TorchResNetSkip(18, skip="concat").eval()
    randomize_bn_stats(tm, gen)
    path = str(tmp_path / "rn.pth.tar")
    torch.save({"epoch": 2, "best_result": None, "model": tm}, path)
    from fastdepth_tpu.checkpoint.convert import convert_checkpoint

    params, cfg, meta = convert_checkpoint(path)
    assert cfg.encoder == "resnet18" and cfg.skip == "concat"
    assert meta["epoch"] == 2


@pytest.mark.parametrize("dw", [True, False])
def test_plain_mobilenet_nnconv_converter_parity(dw, tmp_path):
    """Released mobilenet-nnconv5[dw] checkpoint format -> converter ->
    forward parity (reference models.py:420-460 + NNConv)."""
    from torch_oracle import TorchMobileNetNNConv

    gen = torch.Generator().manual_seed(8)
    tm = TorchMobileNetNNConv(TINY_ENC, TINY_DEC, dw=dw).eval()
    randomize_bn_stats(tm, gen)
    x = torch.randn(1, 3, 64, 64, generator=gen)
    with torch.no_grad():
        ref = tm(x).numpy()

    path = str(tmp_path / "m.pth.tar")
    torch.save({"epoch": 4, "best_result": None, "model": tm}, path)
    from fastdepth_tpu.checkpoint.convert import convert_checkpoint

    params, cfg, meta = convert_checkpoint(path)
    assert cfg.skip is None
    assert cfg.decoder == ("nnconv5dw" if dw else "nnconv5")
    assert cfg.encoder_channels == TINY_ENC
    out = build(cfg).apply(
        numpy_to_jax(params), jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        ref, np.asarray(out).transpose(0, 3, 1, 2), atol=5e-4
    )


def test_plain_mobilenet_dense_deconv_channels_and_parity(tmp_path):
    """Plain MobileNet + DENSE DeConv: transpose-conv weights are HWOI,
    so the converter must record stage OUTPUT channels from shape[-2]
    (regression: it once recorded the cin list, so rebuilding from the
    saved config mismatched the converted weights).  Non-default widths
    make the bug observable; forward parity closes the loop."""
    import torch.nn as nn

    import torch_oracle as TO
    from fastdepth_tpu.checkpoint.convert import convert_checkpoint
    from torch_oracle import TorchMobileNetNNConv

    k = 3
    tm_base = TorchMobileNetNNConv(TINY_ENC, TINY_DEC, k=5, dw=True)
    dec = TO.DeConv()
    specs = list(zip((TINY_ENC[-1],) + TINY_DEC[:4], TINY_DEC))
    for i, (cin, cout) in enumerate(specs, 1):
        setattr(dec, f"convt{i}", nn.Sequential(
            nn.ConvTranspose2d(cin, cout, k, 2, (k - 1) // 2, k % 2,
                               bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True)))
    dec.convf = nn.Sequential(nn.Conv2d(TINY_DEC[-1], 1, 1, bias=False),
                              nn.BatchNorm2d(1), nn.ReLU(inplace=True))
    tm_base.decoder = dec
    tm = tm_base.eval()
    gen = torch.Generator().manual_seed(11)
    randomize_bn_stats(tm, gen)

    path = str(tmp_path / "mdd.pth.tar")
    torch.save({"epoch": 2, "best_result": None, "model": tm}, path)
    params, cfg, _ = convert_checkpoint(path)
    assert cfg.decoder == "deconv3"
    assert cfg.decoder_channels == TINY_DEC  # couts, not the cin list
    assert cfg.encoder_channels == TINY_ENC

    x = torch.randn(1, 3, 64, 64, generator=gen)
    with torch.no_grad():
        y = tm.mobilenet(x)  # the DeConv shell carries layers, no forward
        for i in range(1, 6):
            y = getattr(dec, f"convt{i}")(y)
        ref = dec.convf(y).numpy()
    out = build(cfg).apply(
        numpy_to_jax(params), jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(ref, np.asarray(out).transpose(0, 3, 1, 2),
                               atol=1e-3)


def test_resnet_plain_honors_decoder_channels():
    """Custom decoder widths on the no-skip ResNet path must reach the
    initialized stage params (regression: init_resnet_depth dropped
    cfg.decoder_channels and silently built the unpruned defaults)."""
    import jax

    cfg = ModelConfig(encoder="resnet18", decoder="nnconv5", skip=None,
                      decoder_channels=(256, 128, 64, 32, 16))
    params = build(cfg).init(jax.random.PRNGKey(0))
    for i, cout in enumerate(cfg.decoder_channels, 1):
        assert params["decoder"][f"stage{i}"]["conv"]["w"].shape[-1] == cout


def test_fastdepth_rejects_wrong_channel_count():
    """decoder_channels must have exactly 5 entries: a longer list would
    orphan stages and reuse the final conv's RNG key."""
    import jax

    cfg = ModelConfig(encoder_channels=TINY_ENC,
                      decoder_channels=TINY_DEC + (4,), skip=None)
    with pytest.raises(ValueError, match="5"):
        build(cfg).init(jax.random.PRNGKey(0))


def test_plain_mobilenet_shuffle_decoder_parity(tmp_path):
    """ShuffleConv value parity vs torch (reference models.py:296-333:
    shuffle-then-conv x4 at in/4^i widths, then a bare final shuffle, no
    pointwise head) — previously shape-only tested.  Needs a 1024-wide
    bottleneck: the five shuffles divide channels by 4^5."""
    import torch.nn as nn

    import torch_oracle as TO
    from fastdepth_tpu.checkpoint.convert import convert_checkpoint
    from torch_oracle import TorchMobileNetNNConv

    enc1024 = TINY_ENC[:13] + (1024,)
    tm_base = TorchMobileNetNNConv(enc1024, TINY_DEC, k=5, dw=True)
    dec = TO.ShuffleConv()
    k = 3
    for i, c in enumerate((256, 64, 16, 4), 1):
        setattr(dec, f"conv{i}", nn.Sequential(
            nn.Conv2d(c, c, k, 1, (k - 1) // 2, bias=False),
            nn.BatchNorm2d(c), nn.ReLU(inplace=True)))
    tm_base.decoder = dec
    tm = tm_base.eval()
    gen = torch.Generator().manual_seed(12)
    randomize_bn_stats(tm, gen)

    path = str(tmp_path / "msh.pth.tar")
    torch.save({"epoch": 1, "best_result": None, "model": tm}, path)
    params, cfg, _ = convert_checkpoint(path)
    assert cfg.decoder == "shuffle3"
    assert cfg.encoder_channels == enc1024

    import torch.nn.functional as TF

    x = torch.randn(1, 3, 64, 64, generator=gen)
    with torch.no_grad():
        y = tm.mobilenet(x)
        for i in range(1, 5):
            y = getattr(dec, f"conv{i}")(TF.pixel_shuffle(y, 2))
        ref = TF.pixel_shuffle(y, 2).numpy()
    out = build(cfg).apply(
        numpy_to_jax(params), jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(ref, np.asarray(out).transpose(0, 3, 1, 2),
                               atol=1e-3)


@pytest.mark.parametrize("dec_name,dec_cls", [
    ("deconv3", "DeConv"), ("deconv3dw", "DeConv"),
    ("upconv", "UpConv"), ("upproj", "UpProj"), ("blconv3", "BLConv"),
])
def test_plain_resnet_registry_decoder_converter(dec_name, dec_cls, tmp_path):
    """Plain ResNet + every registry decoder style: pickle -> converter ->
    forward parity (reference models.py:363-418 + the decoder family)."""
    import torch.nn as nn

    import torch_oracle as TO
    from fastdepth_tpu.checkpoint.convert import convert_checkpoint
    from torch_oracle import TorchResNetEncoder

    # compact torch oracle: resnet18 encoder + conv2 + registry decoder
    from fastdepth_tpu.models.decoders import parse_decoder_name

    kind, k, dw = parse_decoder_name(dec_name)
    dec = getattr(TO, dec_cls)()

    def cbr(cin, cout, kk):
        return nn.Sequential(nn.Conv2d(cin, cout, kk, 1, (kk - 1) // 2, bias=False),
                             nn.BatchNorm2d(cout), nn.ReLU(inplace=True))

    specs = [(1024, 512), (512, 256), (256, 128), (128, 64), (64, 32)]
    if kind == "deconv":
        for i, (cin, cout) in enumerate(specs, 1):
            if dw:
                sub = nn.Sequential(
                    nn.Sequential(nn.ConvTranspose2d(cin, cin, k, 2, (k - 1) // 2,
                                                     k % 2, groups=cin, bias=False),
                                  nn.BatchNorm2d(cin), nn.ReLU(inplace=True)),
                    nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False),
                                  nn.BatchNorm2d(cout), nn.ReLU(inplace=True)))
            else:
                sub = nn.Sequential(nn.ConvTranspose2d(cin, cout, k, 2, (k - 1) // 2,
                                                       k % 2, bias=False),
                                    nn.BatchNorm2d(cout), nn.ReLU(inplace=True))
            setattr(dec, f"convt{i}", sub)
        dec.convf = cbr(32, 1, 1)
    elif kind == "upconv":
        for i, (cin, cout) in enumerate(specs, 1):
            setattr(dec, f"upconv{i}", nn.Sequential(
                nn.Identity(), nn.Conv2d(cin, cout, 5, 1, 2, bias=False),
                nn.BatchNorm2d(cout), nn.ReLU()))
        dec.convf = cbr(32, 1, 1)
    elif kind == "upproj":
        for i, (cin, cout) in enumerate(specs, 1):
            m = nn.Module()
            m.branch1 = nn.Sequential(
                nn.Conv2d(cin, cout, 5, 1, 2, bias=False), nn.BatchNorm2d(cout),
                nn.ReLU(inplace=True),
                nn.Conv2d(cout, cout, 3, 1, 1, bias=False), nn.BatchNorm2d(cout))
            m.branch2 = nn.Sequential(
                nn.Conv2d(cin, cout, 5, 1, 2, bias=False), nn.BatchNorm2d(cout))
            setattr(dec, f"upproj{i}", m)
        dec.convf = cbr(32, 1, 1)
    else:  # blconv dense
        for i, (cin, cout) in enumerate(specs, 1):
            setattr(dec, f"conv{i}", cbr(cin, cout, k))
        dec.conv6 = cbr(32, 1, 1)

    tm = TO.ResNet()
    enc = TorchResNetEncoder(18)
    for name in ("conv1", "bn1", "maxpool", "layer1", "layer2", "layer3", "layer4"):
        setattr(tm, name, getattr(enc, name))
    tm.conv2 = nn.Conv2d(512, 1024, 1)
    tm.decoder = dec
    tm = tm.eval()
    gen = torch.Generator().manual_seed(10)
    randomize_bn_stats(tm, gen)

    path = str(tmp_path / "rp.pth.tar")
    torch.save({"epoch": 3, "best_result": None, "model": tm}, path)
    params, cfg, _ = convert_checkpoint(path)
    assert cfg.encoder == "resnet18" and cfg.skip is None
    assert cfg.decoder == dec_name

    # forward parity: run our model vs a torch composition of the pieces
    x = torch.randn(1, 3, 64, 64, generator=gen)
    import torch.nn.functional as TF

    with torch.no_grad():
        x1 = TF.relu(tm.bn1(tm.conv1(x)))
        y = tm.maxpool(x1)
        for s in range(1, 5):
            y = getattr(tm, f"layer{s}")(y)
        y = tm.conv2(y)
        if kind == "deconv":
            for i in range(1, 6):
                y = getattr(dec, f"convt{i}")(y)
            ref = dec.convf(y)
        elif kind == "upconv":

            def unpool(v):
                mask = torch.zeros(v.size(1), 1, 2, 2)
                mask[:, :, 0, 0] = 1
                return TF.conv_transpose2d(v, mask, stride=2, groups=v.size(1))

            for i in range(1, 6):
                m = getattr(dec, f"upconv{i}")
                y = m[3](m[2](m[1](unpool(y))))
            ref = dec.convf(y)
        elif kind == "upproj":

            def unpool(v):
                mask = torch.zeros(v.size(1), 1, 2, 2)
                mask[:, :, 0, 0] = 1
                return TF.conv_transpose2d(v, mask, stride=2, groups=v.size(1))

            for i in range(1, 6):
                m = getattr(dec, f"upproj{i}")
                u = unpool(y)
                y = TF.relu(m.branch1(u) + m.branch2(u))
            ref = dec.convf(y)
        else:  # blconv
            for i in range(1, 6):
                y = getattr(dec, f"conv{i}")(y)
                y = TF.interpolate(y, scale_factor=2, mode="bilinear",
                                   align_corners=False)
            ref = dec.conv6(y)
        ref = ref.numpy()

    out = build(cfg).apply(
        numpy_to_jax(params), jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        ref, np.asarray(out).transpose(0, 3, 1, 2), atol=1e-3
    )


@pytest.mark.parametrize("skip", ["add", None])
def test_opt_forward_exact(skip):
    """apply_fastdepth_opt (head-commute) is bit-exact vs apply_fastdepth:
    the 1x1 head is per-pixel affine+ReLU, which commutes with nearest
    duplication (reference models.py:722-731 orders upsample before the
    head; the rewrite is a pure scheduling change)."""
    from fastdepth_tpu.config import ModelConfig
    from fastdepth_tpu.models.fused import apply_fastdepth_opt

    dec = TINY_DEC_ADD if skip == "add" else TINY_DEC
    cfg = ModelConfig(
        decoder="nnconv5dw", skip=skip,
        encoder_channels=TINY_ENC, decoder_channels=dec,
    ).validate()
    model = build(cfg)
    params = model.fold(model.init(jax.random.PRNGKey(3)))
    x = jnp.asarray(np.random.RandomState(4).rand(2, 64, 64, 3), jnp.float32)
    ref = np.asarray(jax.jit(model.apply)(params, x))
    got = np.asarray(jax.jit(
        lambda p, a: apply_fastdepth_opt(p, a, cfg))(params, x))
    assert np.array_equal(ref, got)


def test_opt_forward_rejects_bilinear():
    from fastdepth_tpu.config import ModelConfig
    from fastdepth_tpu.models.fused import apply_fastdepth_opt

    cfg = ModelConfig(decoder="blconv5dw", skip=None,
                      encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    model = build(cfg)
    params = model.fold(model.init(jax.random.PRNGKey(0)))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match="nnconv"):
        apply_fastdepth_opt(params, x, cfg)


@pytest.mark.parametrize("decoder", ["deconv5", "deconv3", "deconv5dw", "upconv"])
def test_deconv_fold_matches_unfolded(decoder, rng):
    """BN folding must handle HWOI transpose-conv weights (scale on axis
    2): folded forward == unfolded forward for the whole deconv family
    (dense deconv used to crash in tree_fold with a broadcast error)."""
    cfg = ModelConfig(decoder=decoder, skip=None,
                      encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    m = build(cfg)
    p = m.init(jax.random.PRNGKey(3))
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    a = m.apply(p, x)
    b = m.apply(m.fold(p), x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_skip_with_non_nnconv_decoder_rejected():
    """The reference's skip models hard-code the NNConv decoder
    (models.py:683-697); other decoder names must be rejected, not
    silently run under nnconv semantics."""
    with pytest.raises(ValueError, match="NNConv"):
        ModelConfig(decoder="blconv5dw", skip="add",
                    encoder_channels=TINY_ENC,
                    decoder_channels=TINY_DEC_ADD).validate()
    from fastdepth_tpu.models import from_name

    with pytest.raises(ValueError, match="NNConv"):
        from_name("mobilenet-deconv5-skipconcat")


def test_opt_path_rejects_non_mobilenet_encoder():
    """apply_fastdepth_opt must fail with a clear error for unsupported
    encoders instead of a KeyError deep in the encoder walk."""
    from fastdepth_tpu.models.fused import apply_fastdepth_opt

    cfg = ModelConfig(encoder="resnet18", decoder="nnconv5dw", skip=None,
                      encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    with pytest.raises(ValueError, match="MobileNet"):
        apply_fastdepth_opt({}, jnp.zeros((1, 64, 64, 3)), cfg)


def test_bottleneck_resnet_skip_rejected():
    """resnet50/101/152 + skip fails at validate() with a clear message
    instead of a broadcast error inside jit tracing (Bottleneck tap
    widths never matched — latent in the reference's classes too)."""
    with pytest.raises(ValueError, match="BasicBlock"):
        ModelConfig(encoder="resnet50", skip="add").validate()


def _perturb_bn(tree, rs):
    """Give every BN leaf nontrivial moments/affine so fold tests exercise
    the real normalization math (jax-tree analogue of randomize_bn_stats)."""
    if isinstance(tree, dict):
        if set(tree) == {"scale", "bias", "mean", "var"}:
            c = tree["mean"].shape[0]
            return {
                "scale": jnp.asarray(rs.rand(c).astype(np.float32) + 0.5),
                "bias": jnp.asarray(rs.randn(c).astype(np.float32) * 0.1),
                "mean": jnp.asarray(rs.randn(c).astype(np.float32) * 0.1),
                "var": jnp.asarray(rs.rand(c).astype(np.float32) + 0.5),
            }
        return {k: _perturb_bn(v, rs) for k, v in tree.items()}
    return tree


@pytest.mark.parametrize("skip", ["add", "concat"])
def test_bottleneck_skip_extension(skip):
    """Beyond-reference: bottleneck_skips=True enables resnet50 skip models
    (1x1+BN-projected adds / width-generalized concats).  Checks forward
    shape, projection inventory, and folded==unfolded."""
    cfg = ModelConfig(encoder="resnet50", skip=skip,
                      bottleneck_skips=True).validate()
    m = build(cfg)
    rs = np.random.RandomState(7)
    p = _perturb_bn(m.init(jax.random.PRNGKey(5)), rs)

    dec = p["decoder"]
    if skip == "add":
        # x1 (64ch) already matches; the four bottleneck taps are projected
        assert sorted(dec["skip_proj"]) == ["x3", "x4", "x5", "x6"]
        assert dec["skip_proj"]["x6"]["w"].shape == (1, 1, 2048, 512)
    else:
        assert "skip_proj" not in dec
        # concat widths follow the actual bottleneck tap channels
        assert dec["decode_conv2"]["conv"]["w"].shape[2] == 512 + 1024

    x = jnp.asarray(rs.randn(1, 64, 64, 3).astype(np.float32))
    y = m.apply(p, x)
    assert y.shape == (1, 64, 64, 1)
    yf = m.apply(m.fold(p), x)
    # outputs are O(1e4) at random init with perturbed BN -> relative tol
    # (fp32 rounding compounds over the 50-layer encoder)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yf), rtol=1e-3)


def test_bottleneck_skips_flag_misuse_rejected():
    """The extension flag is meaningless off bottleneck-ResNet skip models."""
    with pytest.raises(ValueError, match="bottleneck_skips"):
        ModelConfig(encoder="resnet18", skip="add",
                    bottleneck_skips=True).validate()
    with pytest.raises(ValueError, match="bottleneck_skips"):
        ModelConfig(encoder="mobilenet", skip="add",
                    bottleneck_skips=True).validate()
    with pytest.raises(ValueError, match="bottleneck_skips"):
        ModelConfig(encoder="resnet50", skip=None,
                    bottleneck_skips=True).validate()


def test_basic_block_skip_tree_unchanged_by_extension_code():
    """The BasicBlock (reference-parity) path must not grow projections:
    its param tree is exactly the pre-extension layout."""
    from fastdepth_tpu.models import resnet as RN

    cfg = ModelConfig(encoder="resnet18", skip="add").validate()
    p = RN.init_resnet_depth(jax.random.PRNGKey(0), cfg)
    assert "skip_proj" not in p["decoder"]
    cfgc = ModelConfig(encoder="resnet18", skip="concat").validate()
    pc = RN.init_resnet_depth(jax.random.PRNGKey(0), cfgc)
    # reference concat widths 768/384/192/128 (models.py:598-602)
    assert [pc["decoder"][f"decode_conv{i}"]["conv"]["w"].shape[2]
            for i in range(1, 6)] == [1024, 768, 384, 192, 128]


def test_plain_resnet_converter_infers_custom_decoder_widths(tmp_path):
    """convert_resnet_plain must record the decoder widths it actually
    converted (like convert_mobilenet_plain does) — recording the
    default unpruned widths would make any re-init from the config
    silently mismatch a pruned/custom decoder (review finding r4)."""
    import torch.nn as nn

    import torch_oracle as TO
    from fastdepth_tpu.checkpoint.convert import convert_checkpoint
    from torch_oracle import TorchResNetEncoder, randomize_bn_stats

    dec = TO.DeConv()
    specs = [(1024, 400), (400, 200), (200, 100), (100, 48), (48, 24)]
    for i, (cin, cout) in enumerate(specs, 1):
        setattr(dec, f"convt{i}", nn.Sequential(
            nn.ConvTranspose2d(cin, cout, 3, 2, 1, 1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True)))
    dec.convf = nn.Sequential(nn.Conv2d(24, 1, 1, bias=False),
                              nn.BatchNorm2d(1), nn.ReLU(inplace=True))
    tm = TO.ResNet()
    enc = TorchResNetEncoder(18)
    for name in ("conv1", "bn1", "maxpool", "layer1", "layer2", "layer3",
                 "layer4"):
        setattr(tm, name, getattr(enc, name))
    tm.conv2 = nn.Conv2d(512, 1024, 1)
    tm.decoder = dec
    tm = tm.eval()
    randomize_bn_stats(tm, torch.Generator().manual_seed(3))

    path = str(tmp_path / "rp_custom.pth.tar")
    torch.save({"epoch": 1, "best_result": None, "model": tm}, path)
    params, cfg, _ = convert_checkpoint(path)
    assert cfg.decoder_channels == (400, 200, 100, 48, 24)
    # a model re-initialized FROM the config must accept the converted
    # params (the regression deferred the mismatch to jit trace time)
    out = build(cfg).apply(numpy_to_jax(params),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert out.shape == (1, 64, 64, 1)
