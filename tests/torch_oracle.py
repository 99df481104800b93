"""Torch oracle of the reference OccuSeg model (eval-mode semantics).

An independent PyTorch re-derivation of `LearningBWDenseUNet`
(`/root/reference/examples/ScanNet/model.py:657-717`) and the recursive
UNet builder (`networkArchitectures.py:202-306`), built so that:

  * its `state_dict()` keys are EXACTLY the reference checkpoint's keys
    (module tree: `backbone.{sub,unet.<ints>,bn,linear,fc_*,linear_*}` +
    top-level `fc_bw/linear_bw/fc_occupancy/linear_occupancy`);
  * its forward reproduces the reference layer semantics: weight layout
    [K^3, Cin, Cout] (`submanifoldConvolution.py:26-29`), NIN weight
    [nIn, nOut] (`networkInNetwork.py:66`), eval BN
    (x - rm)/sqrt(rv + eps=1e-4) * w + b then leaky
    (`batchNormalization.py:27-37`), UNet leakiness=0 (ReLU),
    JoinTable = concat(identity, deconv) identity-first
    (`networkArchitectures.py:292-302`), heads with no hidden activation,
    sigmoid on the 1-dim offset head, Softplus on bw/occupancy
    (`model.py:683-717`).

Sparse topology is injected as precomputed gather maps (our plan's
nbr/child/up/p2v) — plan construction itself is verified against dense
oracles elsewhere; THIS oracle pins down layer semantics, module wiring
and the checkpoint key/layout contract for golden-activation parity
(SURVEY §4c; VERDICT r1 #3).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn


def _gather(f: torch.Tensor, idx: torch.Tensor) -> torch.Tensor:
    safe = idx.clamp(min=0)
    out = f[safe.long()]
    return out * (idx >= 0).float().unsqueeze(-1)


class TSeq(nn.Module):
    """Sequential with integer child names (scn.Sequential analog)."""

    def __init__(self, *mods):
        super().__init__()
        self._n = 0
        for m in mods:
            self.add(m)

    def add(self, m):
        self.add_module(str(self._n), m)
        self._n += 1
        return self

    def forward(self, x):
        for i in range(self._n):
            x = getattr(self, str(i))(x)
        return x


class TIdentity(nn.Module):
    def forward(self, x):
        return x


class TNIN(nn.Module):
    """NetworkInNetwork shortcut; weight [nIn, nOut]."""

    def __init__(self, cin, cout):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(cin, cout) * (2.0 / cin) ** 0.5)

    def forward(self, f):
        return f @ self.weight


class TBNLeaky(nn.Module):
    """Eval-mode BatchNormLeakyReLU (eps 1e-4; leakiness 0 = ReLU)."""

    def __init__(self, c, leakiness=0.0, eps=1e-4):
        super().__init__()
        self.weight = nn.Parameter(torch.rand(c) * 0.5 + 0.75)
        self.bias = nn.Parameter(torch.randn(c) * 0.1)
        self.register_buffer("running_mean", torch.randn(c) * 0.1)
        self.register_buffer("running_var", torch.rand(c) * 0.5 + 0.75)
        self.leakiness = leakiness
        self.eps = eps

    def forward(self, f):
        xhat = (f - self.running_mean) / torch.sqrt(self.running_var
                                                    + self.eps)
        y = xhat * self.weight + self.bias
        return torch.maximum(y, self.leakiness * y)


class TGatherConv(nn.Module):
    """Rulebook gather-matmul conv; weight [K, Cin, Cout]. `table` is a
    fixed int32 [rows_out, K] map (plain attribute — not in state_dict)."""

    def __init__(self, cin, cout, table: np.ndarray):
        super().__init__()
        K = table.shape[1]
        std = (2.0 / (cin * K)) ** 0.5
        self.weight = nn.Parameter(torch.randn(K, cin, cout) * std)
        self.table = torch.from_numpy(np.asarray(table, np.int64))

    def forward(self, f):
        out = None
        for k in range(self.table.shape[1]):
            g = _gather(f, self.table[:, k])
            o = g @ self.weight[k]
            out = o if out is None else out + o
        return out


class ConcatTable(nn.Module):
    def __init__(self, m0, m1):
        super().__init__()
        self.add_module("0", m0)
        self.add_module("1", m1)

    def forward(self, x):
        return (getattr(self, "0")(x), getattr(self, "1")(x))


class AddTable(nn.Module):
    def forward(self, pair):
        return pair[0] + pair[1]


class JoinTable(nn.Module):
    def forward(self, pair):
        return torch.cat([pair[0], pair[1]], dim=1)


def build_unet(planes, reps, residual, plan, level):
    """Reference recursive U builder (`networkArchitectures.py:276-305`)
    with gather tables bound per level."""
    lv = plan.levels[level]
    nbr = np.asarray(lv.nbr)
    seq = TSeq()

    def block(m, a, b):
        assert residual, "oracle covers the flagship residual config"
        sc = TIdentity() if a == b else TNIN(a, b)
        m.add(ConcatTable(sc, TSeq(
            TBNLeaky(a), TGatherConv(a, b, nbr),
            TBNLeaky(b), TGatherConv(b, b, nbr))))
        m.add(AddTable())

    for _ in range(reps):
        block(seq, planes[0], planes[0])
    if len(planes) > 1:
        tr = plan.transitions[level]
        inner = TSeq(
            TBNLeaky(planes[0]),
            TGatherConv(planes[0], planes[1], np.asarray(tr.child)),
            build_unet(planes[1:], reps, residual, plan, level + 1),
            TBNLeaky(planes[1]),
            TGatherConv(planes[1], planes[0], np.asarray(tr.up)),
        )
        seq.add(ConcatTable(TIdentity(), inner))
        seq.add(JoinTable())
        for i in range(reps):
            block(seq, planes[0] * (2 if i == 0 else 1), planes[0])
    return seq


class OracleInstanceDenseUNet(nn.Module):
    """`model.py:657-691` with InputLayer mode 4 (mean) / OutputLayer as
    fixed p2v maps."""

    def __init__(self, planes, num_classes, plan, in_ch=3, reps=1):
        super().__init__()
        self.p2v = torch.from_numpy(np.asarray(plan.p2v, np.int64))
        self.cap0 = int(np.asarray(plan.levels[0].keys).shape[0])
        self.sub = TGatherConv(in_ch, planes[0],
                               np.asarray(plan.levels[0].nbr))
        self.unet = build_unet(list(planes), reps, True, plan, 0)
        self.bn = TBNLeaky(planes[0])  # BatchNormReLU
        m = planes[0]
        self.linear = nn.Linear(m, num_classes)
        self.fc_regress = nn.Linear(m, m)
        self.linear_regress = nn.Linear(m, 1)
        self.fc_embedding = nn.Linear(m, m)
        self.linear_embedding = nn.Linear(m, m)
        self.fc_displacement = nn.Linear(m, m)
        self.linear_displacement = nn.Linear(m, 3)

    def _input(self, point_feats):
        """InputLayer mode 4: mean of point features per voxel."""
        P, C = point_feats.shape
        vox = torch.zeros(self.cap0, C)
        cnt = torch.zeros(self.cap0)
        valid = self.p2v >= 0
        idx = self.p2v[valid]
        vox.index_add_(0, idx, point_feats[valid])
        cnt.index_add_(0, idx, torch.ones(int(valid.sum())))
        return vox / cnt.clamp(min=1).unsqueeze(-1)

    def forward(self, point_feats):
        x = self._input(point_feats)
        x = self.sub(x)
        x = self.unet(x)
        x = self.bn(x)
        feature = _gather(x, self.p2v)  # OutputLayer
        y = self.linear(feature)
        embedding = self.linear_embedding(self.fc_embedding(feature))
        offset = torch.sigmoid(self.linear_regress(self.fc_regress(feature)))
        displacement = self.linear_displacement(
            self.fc_displacement(feature))
        return y, feature, embedding, offset, displacement


class OracleLearningBWDenseUNet(nn.Module):
    """`model.py:693-717`."""

    def __init__(self, planes, num_classes, plan, in_ch=3, reps=1):
        super().__init__()
        self.backbone = OracleInstanceDenseUNet(planes, num_classes, plan,
                                                in_ch, reps)
        m = planes[0]
        self.fc_bw = nn.Linear(m, m)
        self.linear_bw = nn.Linear(m, 2)
        self.fc_occupancy = nn.Linear(m, m)
        self.linear_occupancy = nn.Linear(m, 1)

    def forward(self, point_feats):
        y, feature, embedding, offset, displacement = \
            self.backbone(point_feats)
        bw = torch.nn.functional.softplus(self.linear_bw(self.fc_bw(feature)))
        occupancy = torch.nn.functional.softplus(
            self.linear_occupancy(self.fc_occupancy(feature)))
        return y, feature, embedding, offset, displacement, bw, occupancy
