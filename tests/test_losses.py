"""Golden tests: losses vs independently-written PyTorch references.

Each torch reference below re-derives the published formula (and the
reference implementation's weighting/eps conventions, cited per test) so the
JAX losses are value-compared without copying reference code.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from deepatlas_tpu.losses import (bending_energy_loss, cross_entropy_loss,
                                  dice_loss_multiclass, dice_loss_on_label,
                                  focal_loss, get_available_losses,
                                  get_loss_function, gradient_loss, l2_loss,
                                  lncc_loss, mse_loss, multiscale_lncc_loss,
                                  ncc_loss, soft_cross_entropy_loss)


def to_torch_cf(x_np):
    """channel-last numpy -> channel-first torch."""
    return torch.from_numpy(np.moveaxis(x_np, -1, 1).copy())


# ---------------------------------------------------------------- dice

def torch_dice_multiclass(logits_cf, labels, n_class, weight_type, no_bg,
                          softmax, eps):
    """DiceLossMultiClass math (loss.py:410-476), independent impl."""
    src = logits_cf
    if softmax:
        src = F.softmax(src, dim=1)
    b, c = src.shape[0], src.shape[1]
    src = src.reshape(b, c, -1)
    tgt = torch.zeros_like(src)
    tgt.scatter_(1, labels.reshape(b, 1, -1).long(), 1)
    if no_bg:
        src, tgt = src[:, 1:], tgt[:, 1:]
    sv, tv = src.sum(2), tgt.sum(2)
    if weight_type == "Simple":
        w = 1.0 / (tv ** (1.0 / 3.0) + eps)
    elif weight_type == "Volume":
        w = 1.0 / (tv + eps)
    else:
        w = torch.ones_like(tv)
    w = w / w.max()
    inter = (src * tgt).sum(2)
    scores = (2 * inter + eps) / (sv + tv + 2 * eps)
    return 1 - (w * scores).sum() / w.sum()


@pytest.mark.parametrize("weight_type,no_bg", [("Uniform", False),
                                               ("Simple", False),
                                               ("Volume", True),
                                               ("Uniform", True)])
def test_dice_multiclass_matches_torch(rng, weight_type, no_bg):
    logits = rng.randn(2, 6, 7, 8, 5).astype(np.float32)
    labels = rng.randint(0, 5, size=(2, 6, 7, 8))
    ours = dice_loss_multiclass(jnp.asarray(logits), jnp.asarray(labels),
                                n_class=5, weight_type=weight_type,
                                no_bg=no_bg, softmax=True, eps=1e-6)
    ref = torch_dice_multiclass(to_torch_cf(logits), torch.from_numpy(labels),
                                5, weight_type, no_bg, True, 1e-6)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_dice_on_label(rng):
    a = rng.randint(0, 4, size=(2, 5, 6, 7))
    ours = float(dice_loss_on_label(jnp.asarray(a), jnp.asarray(a), n_class=4))
    # perfect overlap -> scores ~ 2V/(2V+eps) ~ 1
    assert ours < 1e-4
    b = rng.randint(0, 4, size=(2, 5, 6, 7))
    partial = float(dice_loss_on_label(jnp.asarray(a), jnp.asarray(b), n_class=4))
    assert 0 < partial < 1


# ---------------------------------------------------------------- similarity

def test_ncc_matches_torch(rng):
    x = rng.rand(3, 6, 7, 8, 1).astype(np.float32)
    y = rng.rand(3, 6, 7, 8, 1).astype(np.float32)
    ours = float(ncc_loss(jnp.asarray(x), jnp.asarray(y)))
    xt = torch.from_numpy(x.reshape(3, -1))
    yt = torch.from_numpy(y.reshape(3, -1))
    xc = xt - xt.mean(1, keepdim=True)
    yc = yt - yt.mean(1, keepdim=True)
    ncc = (xc * yc).mean(1) / (xc.pow(2).mean(1).sqrt()
                               * yc.pow(2).mean(1).sqrt())
    np.testing.assert_allclose(ours, float(1 - ncc.mean()), rtol=1e-5)


def test_ncc_self_is_zero(rng):
    x = rng.rand(2, 5, 6, 7, 1).astype(np.float32)
    assert abs(float(ncc_loss(jnp.asarray(x), jnp.asarray(x)))) < 1e-5


def torch_lncc(i_cf, j_cf, k, stride, dil, eps):
    """Windowed LNCC math (loss.py:597-617), independent impl."""
    kern = torch.ones(1, 1, k, k, k)
    numel = float(k ** 3)

    def ws(x):
        return F.conv3d(x, kern, padding=0, stride=stride, dilation=dil)

    i_s, j_s = ws(i_cf), ws(j_cf)
    i2_s, j2_s, ij_s = ws(i_cf ** 2), ws(j_cf ** 2), ws(i_cf * j_cf)
    i_m, j_m = i_s / numel, j_s / numel
    cross = ij_s - i_m * j_s - j_m * i_s + i_m * j_m * numel
    i_v = i2_s - 2 * i_m * i_s + i_m ** 2 * numel
    j_v = j2_s - 2 * j_m * j_s + j_m ** 2 * numel
    return 1 - (cross ** 2 / (i_v * j_v + eps)).mean()


@pytest.mark.parametrize("k", [5, 9])
def test_lncc_matches_torch(rng, k):
    x = rng.rand(1, 14, 15, 16, 1).astype(np.float32)
    y = rng.rand(1, 14, 15, 16, 1).astype(np.float32)
    ours = float(lncc_loss(jnp.asarray(x), jnp.asarray(y), filter_size=k,
                           eps=1e-6))
    ref = float(torch_lncc(to_torch_cf(x), to_torch_cf(y), k, 1, 1, 1e-6))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_multiscale_lncc_small_volume(rng):
    # min dim 16 <= 64 -> single scale k=8, dil 1, step max(9//4,1)=2
    x = rng.rand(1, 16, 18, 20, 1).astype(np.float32)
    y = rng.rand(1, 16, 18, 20, 1).astype(np.float32)
    ours = float(multiscale_lncc_loss(jnp.asarray(x), jnp.asarray(y)))
    ref = float(torch_lncc(to_torch_cf(x), to_torch_cf(y), 8, 2, 1, 1e-5))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_multiscale_lncc_medium_volume(rng):
    # min dim 66 > 64 -> scales [16, 33] w [.3,.7] dil 2, steps [4, 8]
    x = rng.rand(1, 66, 68, 70, 1).astype(np.float32)
    y = (0.7 * x + 0.3 * rng.rand(1, 66, 68, 70, 1)).astype(np.float32)
    ours = float(multiscale_lncc_loss(jnp.asarray(x), jnp.asarray(y)))
    ref = (0.3 * float(torch_lncc(to_torch_cf(x), to_torch_cf(y), 16, 4, 2, 1e-5))
           + 0.7 * float(torch_lncc(to_torch_cf(x), to_torch_cf(y), 33, 8, 2, 1e-5)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3)


def test_mse(rng):
    x = rng.rand(2, 4, 5, 6, 1).astype(np.float32)
    y = rng.rand(2, 4, 5, 6, 1).astype(np.float32)
    np.testing.assert_allclose(float(mse_loss(jnp.asarray(x), jnp.asarray(y))),
                               ((x - y) ** 2).mean(), rtol=1e-6)


# ---------------------------------------------------------------- regularizers

def torch_gradient_loss(field_cf, spacing=(1., 1., 1.)):
    """Intended central-difference first-order penalty (loss.py:638-671 with
    the dy/dz sign bug at loss.py:661-663 corrected)."""
    sp = torch.tensor(spacing)
    sp = sp / sp.min()
    dims = torch.tensor(field_cf.shape[2:]).float()
    dims = dims / dims.min()
    b, c = field_cf.shape[0], field_cf.shape[1]
    d0 = (field_cf[:, :, 2:] - field_cf[:, :, :-2]).abs().reshape(b, c, -1)
    d1 = (field_cf[:, :, :, 2:] - field_cf[:, :, :, :-2]).abs().reshape(b, c, -1)
    d2 = (field_cf[..., 2:] - field_cf[..., :-2]).abs().reshape(b, c, -1)
    d0 = d0.pow(2).mean(2) * (dims * sp / sp[0]) ** 2
    d1 = d1.pow(2).mean(2) * (dims * sp / sp[1]) ** 2
    d2 = d2.pow(2).mean(2) * (dims * sp / sp[2]) ** 2
    return (d0.mean() + d1.mean() + d2.mean()) / 3.0


def torch_bending_energy(f, spacing=(1., 1., 1.)):
    """Bending energy (loss.py:687-730), independent impl."""
    sp = torch.tensor(spacing)
    sp = sp / sp.min()
    dims = torch.tensor(f.shape[2:]).float()
    dims = dims / dims.min()
    b, c = f.shape[0], f.shape[1]
    i = f[:, :, 1:-1, 1:-1, 1:-1]
    fl = lambda x: x.reshape(b, c, -1)
    dd0 = fl((f[:, :, 2:, 1:-1, 1:-1] + f[:, :, :-2, 1:-1, 1:-1] - 2 * i).abs())
    dd1 = fl((f[:, :, 1:-1, 2:, 1:-1] + f[:, :, 1:-1, :-2, 1:-1] - 2 * i).abs())
    dd2 = fl((f[:, :, 1:-1, 1:-1, 2:] + f[:, :, 1:-1, 1:-1, :-2] - 2 * i).abs())
    d01 = fl((f[:, :, 2:, 2:, 1:-1] + f[:, :, :-2, :-2, 1:-1]
              - f[:, :, 2:, :-2, 1:-1] - f[:, :, :-2, 2:, 1:-1]).abs())
    d12 = fl((f[:, :, 1:-1, 2:, 2:] + f[:, :, 1:-1, :-2, :-2]
              - f[:, :, 1:-1, 2:, :-2] - f[:, :, 1:-1, :-2, 2:]).abs())
    d02 = fl((f[:, :, 2:, 1:-1, 2:] + f[:, :, :-2, 1:-1, :-2]
              - f[:, :, 2:, 1:-1, :-2] - f[:, :, :-2, 1:-1, 2:]).abs())
    dd0 = dd0.pow(2).mean(2) * (dims * sp / sp[0] ** 2) ** 2
    dd1 = dd1.pow(2).mean(2) * (dims * sp / sp[1] ** 2) ** 2
    dd2 = dd2.pow(2).mean(2) * (dims * sp / sp[2] ** 2) ** 2
    d01 = d01.pow(2).mean(2) * (dims * sp / (sp[0] * sp[1])) ** 2
    d12 = d12.pow(2).mean(2) * (dims * sp / (sp[1] * sp[2])) ** 2
    d02 = d02.pow(2).mean(2) * (dims * sp / (sp[2] * sp[0])) ** 2
    return (dd0.mean() + dd1.mean() + dd2.mean()
            + 2 * d01.mean() + 2 * d12.mean() + 2 * d02.mean()) / 9.0


@pytest.mark.parametrize("spacing", [(1., 1., 1.), (1., 2., 1.5)])
def test_gradient_loss_matches(rng, spacing):
    field = rng.randn(2, 7, 8, 9, 3).astype(np.float32) * 0.1
    ours = float(gradient_loss(jnp.asarray(field), spacing=spacing))
    ref = float(torch_gradient_loss(to_torch_cf(field), spacing))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


@pytest.mark.parametrize("spacing", [(1., 1., 1.), (1., 2., 1.5)])
def test_bending_energy_matches(rng, spacing):
    field = rng.randn(2, 7, 8, 9, 3).astype(np.float32) * 0.1
    ours = float(bending_energy_loss(jnp.asarray(field), spacing=spacing))
    ref = float(torch_bending_energy(to_torch_cf(field), spacing))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_l2(rng):
    x = rng.randn(2, 4, 4, 4, 3).astype(np.float32)
    np.testing.assert_allclose(float(l2_loss(jnp.asarray(x))),
                               (x ** 2).mean(), rtol=1e-6)


# ---------------------------------------------------------------- entropy

def test_cross_entropy_matches_torch(rng):
    logits = rng.randn(2, 5, 6, 7, 4).astype(np.float32)
    labels = rng.randint(0, 4, size=(2, 5, 6, 7))
    ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    ref = F.cross_entropy(to_torch_cf(logits), torch.from_numpy(labels).long())
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_soft_cross_entropy_one_hot_equals_ce(rng):
    logits = rng.randn(2, 4, 5, 6, 3).astype(np.float32)
    labels = rng.randint(0, 3, size=(2, 4, 5, 6))
    sce = float(soft_cross_entropy_loss(jnp.asarray(logits),
                                        jnp.asarray(labels), softmax=True))
    ce = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(sce, ce, rtol=1e-5)


def test_focal_gamma0_is_ce(rng):
    logits = rng.randn(2, 4, 5, 6, 3).astype(np.float32)
    labels = rng.randint(0, 3, size=(2, 4, 5, 6))
    fl = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                          class_num=3, gamma=0.0))
    ce = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(fl, ce, rtol=1e-5)


def test_focal_matches_manual(rng):
    logits = rng.randn(2, 3, 3, 3, 4).astype(np.float32)
    labels = rng.randint(0, 4, size=(2, 3, 3, 3))
    alpha = [0.1, 0.2, 0.3, 0.4]
    ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                            class_num=4, alpha=alpha, gamma=2.0))
    lt = to_torch_cf(logits).permute(0, 2, 3, 4, 1).reshape(-1, 4)
    tt = torch.from_numpy(labels).reshape(-1).long()
    logp = F.log_softmax(lt, dim=1).gather(1, tt[:, None])[:, 0]
    p = logp.exp()
    at = torch.tensor(alpha)[tt]
    ref = (-at * (1 - p) ** 2 * logp).mean()
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


# ---------------------------------------------------------------- registry

def test_registry_keys_match_reference():
    assert set(get_available_losses()) == {
        "ncc", "lncc", "mse", "gradient", "bendingEnergy", "dice", "L2",
        "focal", "cross_entropy", "soft_cross_entropy"}


def test_registry_dice_factory_matches_train_seg_settings(rng):
    # train_seg.py:55 loss_settings
    fn = get_loss_function("dice")(n_class=5, weight_type="Uniform",
                                   no_bg=False, softmax=True, eps=1e-6)
    logits = rng.randn(1, 4, 5, 6, 5).astype(np.float32)
    labels = rng.randint(0, 5, size=(1, 4, 5, 6))
    direct = dice_loss_multiclass(jnp.asarray(logits), jnp.asarray(labels),
                                  n_class=5, weight_type="Uniform",
                                  no_bg=False, softmax=True, eps=1e-6)
    np.testing.assert_allclose(float(fn(jnp.asarray(logits),
                                        jnp.asarray(labels))), float(direct))


def test_registry_unknown_loss_raises():
    with pytest.raises(KeyError):
        get_loss_function("nope")
