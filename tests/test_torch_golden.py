"""Golden-value tests: import weights from small torch replicas of the
reference blocks and compare activations (SURVEY.md §4 'golden-value tests
against reference checkpoints' — no real checkpoints exist in this container,
so the oracles are torch modules built to the reference's documented
architecture with reference state-dict naming)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unidistill_tpu.layers.bev_backbone import BaseBEVBackbone  # noqa: E402
from unidistill_tpu.layers.center_head import CenterHead  # noqa: E402
from unidistill_tpu.layers.resnet import Bottleneck  # noqa: E402
from unidistill_tpu.training.torch_import import (  # noqa: E402
    TreeBuilder,
    _import_bev_backbone,
    _import_center_head,
    conv2d,
)


def _to_jax_stats(tree):
    return jax.tree.map(jnp.asarray, tree)


def test_bev_backbone_matches_torch_replica():
    """Reference BaseBEVBackbone (base_bev_backbone.py:10-174) torch replica
    → import → identical eval activations."""
    layer_nums, strides, filters = (2, 2), (1, 2), (8, 16)
    ups, upf = (1, 2), (16, 16)
    cin = 8

    blocks, deblocks = [], []
    c_in_list = [cin, filters[0]]
    for i in range(2):
        layers = [
            tnn.ZeroPad2d(1),
            tnn.Conv2d(c_in_list[i], filters[i], 3, stride=strides[i], padding=0,
                       bias=False),
            tnn.BatchNorm2d(filters[i], eps=1e-3, momentum=0.01),
            tnn.ReLU(),
        ]
        for _ in range(layer_nums[i]):
            layers += [
                tnn.Conv2d(filters[i], filters[i], 3, padding=1, bias=False),
                tnn.BatchNorm2d(filters[i], eps=1e-3, momentum=0.01),
                tnn.ReLU(),
            ]
        blocks.append(tnn.Sequential(*layers))
        deblocks.append(
            tnn.Sequential(
                tnn.ConvTranspose2d(filters[i], upf[i], ups[i], stride=ups[i],
                                    bias=False),
                tnn.BatchNorm2d(upf[i], eps=1e-3, momentum=0.01),
                tnn.ReLU(),
            )
        )

    class TorchBEV(tnn.Module):
        def __init__(self):
            super().__init__()
            self.blocks = tnn.ModuleList(blocks)
            self.deblocks = tnn.ModuleList(deblocks)

        def forward(self, x):
            outs = []
            for b, d in zip(self.blocks, self.deblocks):
                x = b(x)
                outs.append(d(x))
            return torch.cat(outs, 1)

    tm = TorchBEV().eval()
    # randomize BN stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1, 0.2)
                m.bias.normal_(0, 0.2)

    sd = {f"prefix.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    b = TreeBuilder()
    _import_bev_backbone(b, sd, "prefix", "m", layer_nums, ups)

    x = np.random.RandomState(0).randn(2, 24, 24, cin).astype(np.float32)
    ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()

    jm = BaseBEVBackbone(layer_nums, strides, filters, ups, upf,
                         dtype=jnp.float32)
    variables = {"params": _to_jax_stats(b.params["m"]),
                 "batch_stats": _to_jax_stats(b.stats["m"])}
    ours, _ = jm.apply(variables, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)


def test_center_head_matches_torch_replica():
    """Reference CenterHead/SepHead (center_head.py:58-99, 311-375) replica."""
    tasks = (("car",), ("truck", "construction_vehicle"))
    common_heads = (("iou", (1, 2)), ("reg", (2, 2)))
    cin, sc = 16, 8

    class TorchSep(tnn.Module):
        def __init__(self, ncls):
            super().__init__()
            for name, (ch, nconv) in list(common_heads) + [("hm", (ncls, 2))]:
                seq = []
                for _ in range(nconv - 1):
                    seq += [tnn.Conv2d(sc, 64, 3, padding=1, bias=True),
                            tnn.BatchNorm2d(64), tnn.ReLU()]
                seq += [tnn.Conv2d(64, ch, 3, padding=1, bias=True)]
                setattr(self, name, tnn.Sequential(*seq))

        def forward(self, x):
            return {n: getattr(self, n)(x) for n, _ in
                    list(common_heads) + [("hm", None)]}

    class TorchHead(tnn.Module):
        def __init__(self):
            super().__init__()
            self.shared_conv = tnn.Sequential(
                tnn.Conv2d(cin, sc, 3, padding=1, bias=True),
                tnn.BatchNorm2d(sc), tnn.ReLU(),
            )
            self.tasks = tnn.ModuleList(
                [TorchSep(len(t)) for t in tasks]
            )

        def forward(self, x):
            x = self.shared_conv(x)
            return [t(x) for t in self.tasks]

    tm = TorchHead().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    # SepHead branch convs use 64 head_conv like ours; names match importer
    sd = {f"dh.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    b = TreeBuilder()
    _import_center_head(b, sd, "dh", "m", tasks, common_heads)

    x = np.random.RandomState(1).randn(1, 12, 12, cin).astype(np.float32)
    ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2))

    jm = CenterHead(tasks=tasks, common_heads=common_heads,
                    share_conv_channel=sc, dtype=jnp.float32)
    variables = {"params": _to_jax_stats(b.params["m"]),
                 "batch_stats": _to_jax_stats(b.stats["m"])}
    ours = jm.apply(variables, jnp.asarray(x), False)
    for tid in range(len(tasks)):
        for name in ("iou", "reg", "hm"):
            r = ref[tid][name].detach().permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(
                np.asarray(ours[tid][name]), r, rtol=1e-3, atol=1e-3,
                err_msg=f"task{tid}/{name}",
            )


def test_resnet_bottleneck_matches_torch():
    """torchvision-style Bottleneck numerics (downsample branch included)."""
    planes, cin = 8, 16

    class TB(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride=2, padding=1,
                                    bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride=2, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

        def forward(self, x):
            out = self.bn1(self.conv1(x)).relu()
            out = self.bn2(self.conv2(out)).relu()
            out = self.bn3(self.conv3(out))
            return (out + self.downsample(x)).relu()

    tm = TB().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    x = np.random.RandomState(2).randn(1, 10, 10, cin).astype(np.float32)
    ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = {
        "conv1": {"kernel": conv2d(sd["conv1.weight"])},
        "conv2": {"kernel": conv2d(sd["conv2.weight"])},
        "conv3": {"kernel": conv2d(sd["conv3.weight"])},
        "downsample_conv": {"kernel": conv2d(sd["downsample.0.weight"])},
    }
    stats = {}
    for tname, jname in (("bn1", "bn1"), ("bn2", "bn2"), ("bn3", "bn3"),
                         ("downsample.1", "downsample_bn")):
        params[jname] = {"scale": sd[f"{tname}.weight"],
                         "bias": sd[f"{tname}.bias"]}
        stats[jname] = {"mean": sd[f"{tname}.running_mean"],
                        "var": sd[f"{tname}.running_var"]}

    jm = Bottleneck(planes=planes, stride=2, downsample=True, dtype=jnp.float32)
    ours = jm.apply(
        {"params": _to_jax_stats(params), "batch_stats": _to_jax_stats(stats)},
        jnp.asarray(x), False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)
