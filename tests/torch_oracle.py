"""Torch oracle models for parity tests.

These build torch modules with the same layer *names* and *semantics* as
the reference checkpoints (reference models.py:654-814,
imagenet/mobilenet.py:12-57) so our converter's name mapping and our JAX
forward pass can both be validated end-to-end against torch CPU.  Unlike
the reference they are channel-list parameterized so tests can run tiny.
"""

from typing import Sequence

import torch
import torch.nn as nn
import torch.nn.functional as F

STRIDES = (1, 2, 1, 2, 1, 2, 1, 1, 1, 1, 1, 2, 1)


def _cbr(cin, cout, k=3, stride=1, groups=1, relu6=True):
    act = nn.ReLU6(inplace=True) if relu6 else nn.ReLU(inplace=True)
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, stride, (k - 1) // 2, groups=groups, bias=False),
        nn.BatchNorm2d(cout),
        act,
    )


def _dw_sep(cin, cout, stride, relu6=True):
    """MobileNet block: dw3x3 + bn + act + pw1x1 + bn + act, flattened to
    one 6-element Sequential (torch key indices 0,1,3,4 hold params)."""
    act = lambda: nn.ReLU6(inplace=True) if relu6 else nn.ReLU(inplace=True)
    return nn.Sequential(
        nn.Conv2d(cin, cin, 3, stride, 1, groups=cin, bias=False),
        nn.BatchNorm2d(cin),
        act(),
        nn.Conv2d(cin, cout, 1, 1, 0, bias=False),
        nn.BatchNorm2d(cout),
        act(),
    )


def _decode_stage(cin, cout, k=5):
    """depthwise-separable decoder stage: Sequential(dw Sequential, pw
    Sequential) giving keys '.0.0', '.0.1', '.1.0', '.1.1'."""
    return nn.Sequential(
        nn.Sequential(
            nn.Conv2d(cin, cin, k, 1, (k - 1) // 2, groups=cin, bias=False),
            nn.BatchNorm2d(cin),
            nn.ReLU(inplace=True),
        ),
        nn.Sequential(
            nn.Conv2d(cin, cout, 1, 1, 0, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True),
        ),
    )


def _pointwise(cin, cout):
    return nn.Sequential(
        nn.Conv2d(cin, cout, 1, 1, 0, bias=False),
        nn.BatchNorm2d(cout),
        nn.ReLU(inplace=True),
    )


class TorchFastDepth(nn.Module):
    """MobileNetSkip{Add,Concat} oracle with reference layer names."""

    def __init__(self, enc: Sequence[int], dec: Sequence[int], skip: str = "add", k: int = 5):
        super().__init__()
        self.skip = skip
        setattr(self, "conv0", _cbr(3, enc[0], 3, 2))
        cin = enc[0]
        for i in range(1, 14):
            setattr(self, f"conv{i}", _dw_sep(cin, enc[i], STRIDES[i - 1]))
            cin = enc[i]
        for i, cout in enumerate(dec, start=1):
            setattr(self, f"decode_conv{i}", _decode_stage(cin, cout, k))
            cin = cout
            if skip == "concat":
                if i == 2:
                    cin += enc[5]
                elif i == 3:
                    cin += enc[3]
                elif i == 4:
                    cin += enc[1]
        self.decode_conv6 = _pointwise(cin, 1)

    def forward(self, x):
        taps = {}
        for i in range(14):
            x = getattr(self, f"conv{i}")(x)
            if i in (1, 3, 5):
                taps[i] = x
        for i in range(1, 6):
            x = getattr(self, f"decode_conv{i}")(x)
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            key = {2: 5, 3: 3, 4: 1}.get(i)
            if key is not None:
                x = x + taps[key] if self.skip == "add" else torch.cat((x, taps[key]), 1)
        return self.decode_conv6(x)


class TorchMobileNetClassifier(nn.Module):
    """imagenet/mobilenet.py:12-63 oracle ('model.{i}' Sequential naming)."""

    def __init__(self, enc: Sequence[int], classes: int = 10, pool: int = 7):
        super().__init__()
        mods = [_cbr(3, enc[0], 3, 2)]
        cin = enc[0]
        for i in range(1, 14):
            mods.append(_dw_sep(cin, enc[i], STRIDES[i - 1]))
            cin = enc[i]
        mods.append(nn.AvgPool2d(pool))
        self.model = nn.Sequential(*mods)
        self.fc = nn.Linear(cin, classes)

    def forward(self, x):
        x = self.model(x)
        return self.fc(x.view(x.size(0), -1))


class _NNConvDecoder(nn.Module):
    """NNConv decoder (reference models.py:224-270 structure/naming)."""

    def __init__(self, cin, dec, k, dw):
        super().__init__()
        c = cin
        for i, cout in enumerate(dec, start=1):
            if dw:
                setattr(self, f"conv{i}", _decode_stage(c, cout, k))
            else:
                setattr(self, f"conv{i}", nn.Sequential(
                    nn.Conv2d(c, cout, k, 1, (k - 1) // 2, bias=False),
                    nn.BatchNorm2d(cout),
                    nn.ReLU(inplace=True),
                ))
            c = cout
        self.conv6 = _pointwise(c, 1)

    def forward(self, x):
        for i in range(1, 6):
            x = getattr(self, f"conv{i}")(x)
            x = F.interpolate(x, scale_factor=2, mode="nearest")
        return self.conv6(x)


class TorchMobileNetNNConv(nn.Module):
    """Plain MobileNet + NNConv decoder oracle — the released
    mobilenet-nnconv5[dw] checkpoint format (reference models.py:420-460
    'mobilenet.{i}' Sequential + models.py:224-270 NNConv naming)."""

    def __init__(self, enc: Sequence[int], dec: Sequence[int], k: int = 5, dw: bool = True):
        super().__init__()
        mods = [_cbr(3, enc[0], 3, 2)]
        cin = enc[0]
        for i in range(1, 14):
            mods.append(_dw_sep(cin, enc[i], STRIDES[i - 1]))
            cin = enc[i]
        self.mobilenet = nn.Sequential(*mods)
        self.decoder = _NNConvDecoder(cin, dec, k, dw)

    def forward(self, x):
        return self.decoder(self.mobilenet(x))


class _BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        return F.relu(self.bn2(self.conv2(y)) + idn)


class _Bottleneck(nn.Module):
    def __init__(self, cin, cmid, stride):
        super().__init__()
        cout = cmid * 4
        self.conv1 = nn.Conv2d(cin, cmid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cmid)
        self.conv2 = nn.Conv2d(cmid, cmid, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cmid)
        self.conv3 = nn.Conv2d(cmid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        return F.relu(self.bn3(self.conv3(y)) + idn)


class TorchResNetEncoder(nn.Module):
    """ResNet backbone oracle with torchvision-compatible state_dict keys
    (the format the reference's ResNet models carry, models.py:371-389).
    torchvision itself is not in this image."""

    LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}

    def __init__(self, layers: int):
        super().__init__()
        bottleneck = layers >= 50
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for s, (width, n) in enumerate(zip((64, 128, 256, 512), self.LAYERS[layers]), 1):
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and s > 1) else 1
                if bottleneck:
                    blocks.append(_Bottleneck(cin, width, stride))
                    cin = width * 4
                else:
                    blocks.append(_BasicBlock(cin, width, stride))
                    cin = width
            setattr(self, f"layer{s}", nn.Sequential(*blocks))

    def forward(self, x):
        x1 = F.relu(self.bn1(self.conv1(x)))
        y = self.maxpool(x1)
        for s in range(1, 5):
            y = getattr(self, f"layer{s}")(y)
        return x1, y


def _conv_bn_relu5(cin, cout):
    """dense 5x5 conv builder, reference models.py:52-59 key layout."""
    return nn.Sequential(
        nn.Conv2d(cin, cout, 5, 1, 2, bias=False),
        nn.BatchNorm2d(cout),
        nn.ReLU(inplace=True),
    )


class TorchResNetSkip(nn.Module):
    """ResNetSkipAdd / ResNetSkipConcat oracle (reference
    models.py:462-652 semantics + state_dict key names)."""

    def __init__(self, layers: int = 18, skip: str = "add"):
        super().__init__()
        self.skip = skip
        enc = TorchResNetEncoder(layers)
        self.conv1, self.bn1, self.maxpool = enc.conv1, enc.bn1, enc.maxpool
        for s in range(1, 5):
            setattr(self, f"layer{s}", getattr(enc, f"layer{s}"))
        num = 2048 if layers >= 50 else 512
        self.conv2 = nn.Conv2d(num, 1024, 1)  # bias=True (models.py:399)
        if skip == "add":
            specs = [(1024, 512), (512, 256), (256, 128), (128, 64), (64, 32)]
        else:
            specs = [(1024, 512), (768, 256), (384, 128), (192, 64), (128, 32)]
        for i, (cin, cout) in enumerate(specs, start=1):
            setattr(self, f"decode_conv{i}", _conv_bn_relu5(cin, cout))
        self.decode_conv6 = _pointwise(32, 1)

    def forward(self, x):
        x1 = F.relu(self.bn1(self.conv1(x)))
        x2 = self.maxpool(x1)
        x3 = self.layer1(x2)
        x4 = self.layer2(x3)
        x5 = self.layer3(x4)
        x6 = self.layer4(x5)
        x7 = self.conv2(x6)
        up = lambda v: F.interpolate(v, scale_factor=2, mode="nearest")
        if self.skip == "add":
            # models.py:534-556 (note stage-5 adds BEFORE the conv)
            y = up(self.decode_conv1(x7) + x6)
            y = up(self.decode_conv2(y) + x5)
            y = up(self.decode_conv3(y) + x4)
            y = up(self.decode_conv4(y) + x3)
            y = up(self.decode_conv5(y + x1))
            return self.decode_conv6(y)
        # models.py:630-652
        y = up(self.decode_conv1(x7))
        y = up(self.decode_conv2(torch.cat((y, x5), 1)))
        y = up(self.decode_conv3(torch.cat((y, x4), 1)))
        y = up(self.decode_conv4(torch.cat((y, x3), 1)))
        y = up(self.decode_conv5(torch.cat((y, x1), 1)))
        return self.decode_conv6(y)


# Pickling-friendly empty shells carrying the reference's class names —
# tests assemble layers onto instances via setattr (nn.Module pickling
# restores __dict__, never calls __init__), letting converter dispatch-by-
# class-name be exercised without reproducing the reference's code.
class ResNet(nn.Module):
    pass


class DeConv(nn.Module):
    pass


class UpConv(nn.Module):
    pass


class UpProj(nn.Module):
    pass


class BLConv(nn.Module):
    pass


class ShuffleConv(nn.Module):
    pass


def randomize_bn_stats(model: nn.Module, gen: torch.Generator):
    """Give BN layers nontrivial running stats so eval-mode parity tests
    exercise the real normalization math."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.num_features, generator=gen) * 0.1)
                m.running_var.copy_(torch.rand(m.num_features, generator=gen) + 0.5)
                m.weight.copy_(torch.rand(m.num_features, generator=gen) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=gen) * 0.1)
