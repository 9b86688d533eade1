"""Shared TF1 reference-graph emulator + independent numpy forward.

Used by test_tf_converter_real.py (toy scale, converter-walk focus) and
test_tf_parity_fullscale.py (the COMPLETE s2/f128 topology at 128x128 —
VERDICT r2 item 1).  The emulator creates ``tf.compat.v1`` variables in the
REFERENCE graph's creation order with the reference's auto-generated names
(root-scope ``Conv``/``Conv_N`` + ``hg_imgproc/Conv*`` for the stem, nested
``BatchReNorm/{beta,gamma,moving_mean,moving_variance,r_max,d_max,curr_t}``
— /root/reference/network/um_v1.py:18-185, /root/reference/network/slim/
ops.py:85-185,266-299).  The numpy forward consumes the SAME raw records in
creation order and reproduces detect_net eval-mode semantics
(/root/reference/network/um_v1.py:71-185): stem, recursive hourglass, the
normalized-uvd concat trick, the ``tiny_dm < -0.9`` masked um branch,
dropout off, plain moving-stats batch norm.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class GraphSpec:
    j: int
    fea: int
    stack: int
    k: int
    in_hw: int
    hg_depth: int
    curr_t: float = 0.321
    bn_eps: float = 1e-3


class RefGraphEmulator:
    """Creates TF1 variables exactly as the reference's slim ``conv2d``
    does: an auto-named ``Conv`` variable_scope holding ``weights`` and
    either ``biases`` or a nested ``BatchReNorm`` scope
    (ops.py:266-299,85-130).  Weights are He-scaled so full-width random
    graphs keep O(1) activations."""

    def __init__(self, rng, spec: GraphSpec, tf_module):
        self.rng = rng
        self.spec = spec
        self.tf = tf_module
        self.layers = []  # creation-ordered records for the numpy oracle

    def conv(self, cin, cout, k, bn=True, stride=1):
        v1 = self.tf.compat.v1
        scale = np.sqrt(2.0 / (k * k * cin))
        rec = {"k": k, "stride": stride, "bn": bn,
               "w": self.rng.normal(0, scale, (k, k, cin, cout))
               .astype(np.float32)}
        with v1.variable_scope(None, default_name="Conv"):
            v1.get_variable("weights", initializer=rec["w"])
            if bn:
                rec["beta"] = self.rng.normal(0, 0.1, cout).astype(np.float32)
                rec["gamma"] = self.rng.normal(1, 0.1, cout).astype(np.float32)
                rec["mean"] = self.rng.normal(0, 0.5, cout).astype(np.float32)
                rec["var"] = self.rng.uniform(0.5, 1.5, cout).astype(np.float32)
                with v1.variable_scope("BatchReNorm"):
                    v1.get_variable("beta", initializer=rec["beta"])
                    v1.get_variable("gamma", initializer=rec["gamma"])
                    v1.get_variable("moving_mean", initializer=rec["mean"])
                    v1.get_variable("moving_variance", initializer=rec["var"])
                    v1.get_variable("r_max",
                                    initializer=np.ones(1, np.float32))
                    v1.get_variable("d_max",
                                    initializer=np.zeros(1, np.float32))
                    v1.get_variable(
                        "curr_t",
                        initializer=np.full((1,), self.spec.curr_t,
                                            np.float32))
            else:
                rec["b"] = self.rng.normal(0, 0.1, cout).astype(np.float32)
                v1.get_variable("biases", initializer=rec["b"])
        self.layers.append(rec)

    def residual(self, cin, cout=None):
        # um_v1.py:18-48: 1x1 half, kxk half, 1x1 out, then 1x1 shortcut
        # only when the channel count changes
        cout = cin if cout is None else cout
        half = cin // 2
        self.conv(cin, half, 1)
        self.conv(half, half, self.spec.k)
        self.conv(half, cout, 1)
        if cout != cin:
            self.conv(cin, cout, 1)

    def hourglass(self, n, fea):
        # um_v1.py:51-69: upper -> lower_in -> (inner) -> lower_out
        self.residual(fea)
        self.residual(fea)
        if n > 1:
            self.hourglass(n - 1, fea)
        self.residual(fea)

    def build(self):
        # detect_net creation sequence (um_v1.py:71-185)
        v1 = self.tf.compat.v1
        sp = self.spec
        with v1.variable_scope("hg_imgproc"):
            self.conv(1, 32, 7, stride=2)
            self.residual(32, 64)
            self.residual(64)
            self.residual(64, sp.fea)
        for i in range(sp.stack):
            self.hourglass(sp.hg_depth, sp.fea)
            self.residual(sp.fea)                       # ll res
            self.conv(sp.fea, sp.fea, 1)                # ll 1x1 (renorm)
            self.conv(sp.fea, sp.j, 1, bn=False)        # hm head
            self.residual(sp.fea + 3, 128)              # hm3 res
            self.conv(128, sp.j, 1, bn=False)           # hm3 head
            cat = sp.fea + 2 * sp.j
            self.residual(cat, 256)                     # um branch
            self.residual(256)
            self.residual(cat, 256)                     # masked um branch
            self.residual(256)
            self.residual(512)                          # combine
            self.conv(512 + 3, 512, 1, bn=False)        # um fc1
            self.conv(512, 512, 1, bn=False)            # um fc2
            self.conv(512, 3 * sp.j, 1, bn=False)       # um head
            if i < sp.stack - 1:
                self.conv(5 * sp.j, sp.fea, 1, bn=False)  # inter re-inject
                self.conv(sp.fea, sp.fea, 1, bn=False)
        # distractors a real checkpoint also contains: the converter must
        # skip them (train_single_gpu.py creates global_step + Adam slots)
        v1.get_variable("global_step", initializer=np.int64(219999))
        self.tf.Variable(np.zeros((7, 7, 1, 32), np.float32),
                         name="hg_imgproc/Conv/weights/Adam")


# ---------------------------------------------------------------------------
# independent numpy forward (consumes the raw records in creation order)
# ---------------------------------------------------------------------------

def np_conv_same(x, w, stride=1):
    """NHWC x HWIO 'SAME' conv via im2col (dtype follows ``x``)."""
    b, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    oh, ow = -(-h // stride), -(-wd // stride)
    ph = max((oh - 1) * stride + kh - h, 0)
    pw = max((ow - 1) * stride + kw - wd, 0)
    xp = np.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                    (pw // 2, pw - pw // 2), (0, 0)))
    cols = np.empty((b, oh, ow, kh * kw * cin), x.dtype)
    for i in range(kh):
        for jj in range(kw):
            patch = xp[:, i:i + (oh - 1) * stride + 1:stride,
                       jj:jj + (ow - 1) * stride + 1:stride, :]
            cols[..., (i * kw + jj) * cin:(i * kw + jj + 1) * cin] = patch
    return cols @ w.reshape(-1, cout).astype(x.dtype)


def np_convbr(x, rec, bn_eps, relu=True):
    y = np_conv_same(x, rec["w"], rec["stride"])
    if rec["bn"]:
        y = ((y - rec["mean"]) / np.sqrt(
            rec["var"].astype(x.dtype) + x.dtype.type(bn_eps))
            * rec["gamma"] + rec["beta"])
    else:
        y = y + rec["b"]
    return np.maximum(y, 0.0) if relu else y


def np_residual(x, it, bn_eps, cout=None):
    cin = x.shape[-1]
    cout = cin if cout is None else cout
    y = np_convbr(x, next(it), bn_eps)
    y = np_convbr(y, next(it), bn_eps)
    y = np_convbr(y, next(it), bn_eps)
    s = x if cout == cin else np_convbr(x, next(it), bn_eps)
    return y + s


def np_maxpool_same(x, k, stride):
    b, h, w, c = x.shape
    oh, ow = -(-h // stride), -(-w // stride)
    ph = max((oh - 1) * stride + k - h, 0)
    pw = max((ow - 1) * stride + k - w, 0)
    xp = np.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                    (pw // 2, pw - pw // 2), (0, 0)),
                constant_values=-np.inf)
    out = np.full((b, oh, ow, c), -np.inf, x.dtype)
    for i in range(k):
        for jj in range(k):
            out = np.maximum(
                out, xp[:, i:i + (oh - 1) * stride + 1:stride,
                        jj:jj + (ow - 1) * stride + 1:stride, :])
    return out


def np_hourglass(x, n, it, spec: GraphSpec):
    upper = np_residual(x, it, spec.bn_eps)
    lower = np_maxpool_same(x, spec.k, 2)
    lower = np_residual(lower, it, spec.bn_eps)
    if n > 1:
        lower = np_hourglass(lower, n - 1, it, spec)
    lower = np_residual(lower, it, spec.bn_eps)
    lower = lower.repeat(2, axis=1).repeat(2, axis=2)
    return upper + lower


def np_forward(layers, dms, spec: GraphSpec, dtype=np.float32):
    """Eval-mode detect_net (um_v1.py:84-183) on the recorded layers.

    ``dtype=np.float64`` gives a near-exact oracle for tight tolerances."""
    eps = spec.bn_eps
    dms = dms.astype(dtype)
    it = iter(layers)
    y = np_convbr(dms, next(it), eps)
    y = np_residual(y, it, eps, 64)
    y = np_maxpool_same(y, 2, 2)
    y = np_residual(y, it, eps)
    hg_ins = np_residual(y, it, eps, spec.fea)

    b = dms.shape[0]
    oh = ow = spec.in_hw // 4
    # um_v1.py:111: resize_images(..., 2) = TF1 BICUBIC with legacy coords,
    # which at this integer ratio is an exact ::4 point subsample (NOT area
    # — method 2 in the TF1 enum is bicubic; verified vs tf.compat.v1)
    tiny = dms[:, ::4, ::4, :]
    uu = np.broadcast_to(
        (np.arange(ow, dtype=dtype) / (ow / 2) - 1)[None, None, :, None],
        (b, oh, ow, 1))
    vv = np.broadcast_to(
        (np.arange(oh, dtype=dtype) / (oh / 2) - 1)[None, :, None, None],
        (b, oh, ow, 1))
    uvd = np.concatenate([uu, vv, tiny], axis=-1).astype(dtype)
    invalid = tiny < -0.9

    outs = {"hm": [], "hm3": [], "um": []}
    for i in range(spec.stack):
        hg = np_hourglass(hg_ins, spec.hg_depth, it, spec)
        ll = np_residual(hg, it, eps)
        ll = np_convbr(ll, next(it), eps)
        hm = np_convbr(ll, next(it), eps, relu=False)
        hm3 = np_residual(np.concatenate([ll, uvd], -1), it, eps, 128)
        hm3 = np_convbr(hm3, next(it), eps, relu=False)

        um_cat = np.concatenate([hg, hm, hm3], -1)
        um_in = np_residual(np_residual(um_cat, it, eps, 256), it, eps)
        um_mask = np.where(invalid, 0.0, um_cat).astype(dtype)
        um_mask = np_residual(np_residual(um_mask, it, eps, 256), it, eps)
        comb = np_residual(np.concatenate([um_in, um_mask], -1), it, eps)
        comb = np.concatenate([comb, uvd], -1)
        f = np_convbr(comb, next(it), eps)
        f = np_convbr(f, next(it), eps)
        um = np_convbr(f, next(it), eps, relu=False)
        outs["hm"].append(hm)
        outs["hm3"].append(hm3)
        outs["um"].append(um)
        if i < spec.stack - 1:
            tmp = np_convbr(np.concatenate([hm, hm3, um], -1), next(it),
                            eps, relu=False)
            inter = np_convbr(ll, next(it), eps, relu=False)
            hg_ins = hg_ins + tmp + inter
    assert next(it, None) is None, "numpy oracle did not consume every layer"
    return outs
