"""End-to-end validation of the TF-checkpoint migration on a REAL checkpoint.

Round 1 only pinned the converter's creation-order walk against our own
module tree; this writes a genuine ``tf.compat.v1`` checkpoint whose
variables are created in the REFERENCE graph's creation order with the
reference's auto-generated names (root-scope ``Conv``/``Conv_N`` +
``hg_imgproc/Conv*`` for the stem, nested ``BatchReNorm/{beta,gamma,
moving_mean,moving_variance,r_max,d_max,curr_t}`` —
/root/reference/network/um_v1.py:18-185, /root/reference/network/slim/
ops.py:85-185,266-299), converts it with ``densereg_tpu.convert``, loads the
result into ``DenseRegNet``, and asserts forward parity against an
INDEPENDENT numpy evaluation that consumes the checkpoint's raw values in
creation order.  If the converter mapped any module to the wrong TF scope,
the two forwards diverge (same-shape mix-ups included: the weights are
random, so any permutation changes the output).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from densereg_tpu.config import NetConfig
from densereg_tpu.convert import convert, load_converted, save_converted

J, FEA, STACK, K = 3, 8, 2, 3
IN_HW = 32
HG_DEPTH = 2     # NetConfig rule: 32 -> 2
CURR_T = 0.321
BN_EPS = 1e-3


# ---------------------------------------------------------------------------
# reference-graph emulation (creation order + names per um_v1.py)
# ---------------------------------------------------------------------------

class RefGraphEmulator:
    """Creates TF1 variables exactly as the reference's slim ``conv2d`` does:
    an auto-named ``Conv`` variable_scope holding ``weights`` and either
    ``biases`` or a nested ``BatchReNorm`` scope (ops.py:266-299,85-130)."""

    def __init__(self, rng):
        self.rng = rng
        self.layers = []  # creation-ordered records for the numpy oracle

    def conv(self, cin, cout, k, bn=True, stride=1):
        v1 = tf.compat.v1
        rec = {"k": k, "stride": stride, "bn": bn,
               "w": self.rng.normal(0, 0.1, (k, k, cin, cout))
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
                    v1.get_variable("r_max", initializer=np.ones(1, np.float32))
                    v1.get_variable("d_max", initializer=np.zeros(1, np.float32))
                    v1.get_variable(
                        "curr_t",
                        initializer=np.full((1,), CURR_T, np.float32))
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
        self.conv(half, half, K)
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
        v1 = tf.compat.v1
        with v1.variable_scope("hg_imgproc"):
            self.conv(1, 32, 7, stride=2)
            self.residual(32, 64)
            self.residual(64)
            self.residual(64, FEA)
        for i in range(STACK):
            self.hourglass(HG_DEPTH, FEA)
            self.residual(FEA)                       # ll res
            self.conv(FEA, FEA, 1)                   # ll 1x1 (renorm)
            self.conv(FEA, J, 1, bn=False)           # hm head
            self.residual(FEA + 3, 128)              # hm3 res
            self.conv(128, J, 1, bn=False)           # hm3 head
            cat = FEA + 2 * J
            self.residual(cat, 256)                  # um branch
            self.residual(256)
            self.residual(cat, 256)                  # masked um branch
            self.residual(256)
            self.residual(512)                       # combine
            self.conv(512 + 3, 512, 1, bn=False)     # um fc1
            self.conv(512, 512, 1, bn=False)         # um fc2
            self.conv(512, 3 * J, 1, bn=False)       # um head
            if i < STACK - 1:
                self.conv(5 * J, FEA, 1, bn=False)   # inter re-injection
                self.conv(FEA, FEA, 1, bn=False)
        # distractors a real checkpoint also contains: the converter must
        # skip them (train_single_gpu.py creates global_step + Adam slots)
        v1.get_variable("global_step", initializer=np.int64(219999))
        tf.Variable(np.zeros((7, 7, 1, 32), np.float32),
                    name="hg_imgproc/Conv/weights/Adam")


# ---------------------------------------------------------------------------
# independent numpy forward (consumes the raw records in creation order)
# ---------------------------------------------------------------------------

def np_conv_same(x, w, stride=1):
    """NHWC x HWIO 'SAME' conv via im2col."""
    b, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    oh, ow = -(-h // stride), -(-wd // stride)
    ph = max((oh - 1) * stride + kh - h, 0)
    pw = max((ow - 1) * stride + kw - wd, 0)
    xp = np.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                    (pw // 2, pw - pw // 2), (0, 0)))
    cols = np.empty((b, oh, ow, kh * kw * cin), np.float32)
    for i in range(kh):
        for jj in range(kw):
            patch = xp[:, i:i + (oh - 1) * stride + 1:stride,
                       jj:jj + (ow - 1) * stride + 1:stride, :]
            cols[..., (i * kw + jj) * cin:(i * kw + jj + 1) * cin] = patch
    return cols @ w.reshape(-1, cout)


def np_convbr(x, rec, relu=True):
    y = np_conv_same(x, rec["w"], rec["stride"])
    if rec["bn"]:
        y = ((y - rec["mean"]) / np.sqrt(rec["var"] + BN_EPS)
             * rec["gamma"] + rec["beta"])
    else:
        y = y + rec["b"]
    return np.maximum(y, 0.0) if relu else y


def np_residual(x, it, cout=None):
    cin = x.shape[-1]
    cout = cin if cout is None else cout
    y = np_convbr(x, next(it))
    y = np_convbr(y, next(it))
    y = np_convbr(y, next(it))
    s = x if cout == cin else np_convbr(x, next(it))
    return y + s


def np_maxpool_same(x, k, stride):
    b, h, w, c = x.shape
    oh, ow = -(-h // stride), -(-w // stride)
    ph = max((oh - 1) * stride + k - h, 0)
    pw = max((ow - 1) * stride + k - w, 0)
    xp = np.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                    (pw // 2, pw - pw // 2), (0, 0)),
                constant_values=-np.inf)
    out = np.full((b, oh, ow, c), -np.inf, np.float32)
    for i in range(k):
        for jj in range(k):
            out = np.maximum(
                out, xp[:, i:i + (oh - 1) * stride + 1:stride,
                        jj:jj + (ow - 1) * stride + 1:stride, :])
    return out


def np_hourglass(x, n, it):
    upper = np_residual(x, it)
    lower = np_maxpool_same(x, K, 2)
    lower = np_residual(lower, it)
    if n > 1:
        lower = np_hourglass(lower, n - 1, it)
    lower = np_residual(lower, it)
    lower = lower.repeat(2, axis=1).repeat(2, axis=2)
    return upper + lower


def np_forward(layers, dms):
    it = iter(layers)
    y = np_convbr(dms, next(it))
    y = np_residual(y, it, 64)
    y = np_maxpool_same(y, 2, 2)
    y = np_residual(y, it)
    hg_ins = np_residual(y, it, FEA)

    b = dms.shape[0]
    oh = ow = IN_HW // 4
    tiny = dms.reshape(b, oh, 4, ow, 4, 1).mean(axis=(2, 4))
    uu = np.broadcast_to(
        (np.arange(ow, dtype=np.float32) / (ow / 2) - 1)[None, None, :, None],
        (b, oh, ow, 1))
    vv = np.broadcast_to(
        (np.arange(oh, dtype=np.float32) / (oh / 2) - 1)[None, :, None, None],
        (b, oh, ow, 1))
    uvd = np.concatenate([uu, vv, tiny], axis=-1).astype(np.float32)
    invalid = tiny < -0.9

    outs = {"hm": [], "hm3": [], "um": []}
    for i in range(STACK):
        hg = np_hourglass(hg_ins, HG_DEPTH, it)
        ll = np_residual(hg, it)
        ll = np_convbr(ll, next(it))
        hm = np_convbr(ll, next(it), relu=False)
        hm3 = np_residual(np.concatenate([ll, uvd], -1), it, 128)
        hm3 = np_convbr(hm3, next(it), relu=False)

        um_cat = np.concatenate([hg, hm, hm3], -1)
        um_in = np_residual(np_residual(um_cat, it, 256), it)
        um_mask = np.where(invalid, 0.0, um_cat).astype(np.float32)
        um_mask = np_residual(np_residual(um_mask, it, 256), it)
        comb = np_residual(np.concatenate([um_in, um_mask], -1), it)
        comb = np.concatenate([comb, uvd], -1)
        f = np_convbr(comb, next(it))
        f = np_convbr(f, next(it))
        um = np_convbr(f, next(it), relu=False)
        outs["hm"].append(hm)
        outs["hm3"].append(hm3)
        outs["um"].append(um)
        if i < STACK - 1:
            tmp = np_convbr(np.concatenate([hm, hm3, um], -1), next(it),
                            relu=False)
            inter = np_convbr(ll, next(it), relu=False)
            hg_ins = hg_ins + tmp + inter
    assert next(it, None) is None, "numpy oracle did not consume every layer"
    return outs


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_real_tf_checkpoint_roundtrip(tmp_path, rng):
    em = RefGraphEmulator(rng)
    graph = tf.Graph()
    with graph.as_default():
        em.build()
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            ckpt = saver.save(sess, str(tmp_path / "model.ckpt"),
                              global_step=219999)

    payload = convert(ckpt, num_stack=STACK, num_fea=FEA, num_joint=J,
                      hg_depth=HG_DEPTH)
    assert payload["renorm_t"] == pytest.approx(CURR_T)

    # msgpack round trip (what serving.Predictor.from_converted reads)
    save_converted(payload, str(tmp_path / "params.msgpack"))
    payload = load_converted(str(tmp_path / "params.msgpack"))

    # spot-check leaf placement at both ends of the walk
    np.testing.assert_array_equal(
        payload["params"]["stem_conv"]["conv"]["kernel"], em.layers[0]["w"])
    np.testing.assert_array_equal(
        payload["params"]["um_head_s1"]["conv"]["kernel"],
        em.layers[-1]["w"])

    # forward parity: converted flax model vs the independent numpy oracle
    import jax

    from densereg_tpu.models import DenseRegNet

    cfg = NetConfig(num_stack=STACK, num_fea=FEA, num_joint=J,
                    input_hw=(IN_HW, IN_HW), compute_dtype="float32")
    net = DenseRegNet(cfg)
    dms = rng.uniform(-1, 1, (2, IN_HW, IN_HW, 1)).astype(np.float32)
    dms[0, :8, :8] = -1.0  # exercise the depth-mask branch

    ref_init = net.init({"params": jax.random.key(0)}, dms, train=False)
    # the converted tree must be structurally identical to a fresh init
    assert (jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.shape, payload["params"]))
        == jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.shape, ref_init["params"])))

    outs = net.apply({"params": payload["params"],
                      "batch_stats": payload["batch_stats"]},
                     dms, train=False)
    expect = np_forward(em.layers, dms)
    for key in ("hm", "hm3", "um"):
        for s in range(STACK):
            np.testing.assert_allclose(
                np.asarray(outs[key][s]), expect[key][s],
                rtol=2e-3, atol=2e-3,
                err_msg=f"{key} stack {s}")
