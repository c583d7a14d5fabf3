"""Stand-ins for the reference's CPU-side dependencies that are absent in
this environment (torchvision, skimage, skvideo), so the reference pipeline
(``/root/reference/test.py`` and friends) can execute for parity rehearsals.

Each shim is an INDEPENDENT numpy implementation of the upstream API's
documented semantics — deliberately NOT routed through this package's JAX
metrics (ops/metrics.py), so a rehearsal comparing "reference pipeline" vs
"our pipeline" exercises two separate metric implementations:

* ``torchvision.transforms.ToTensor`` — HWC uint8 ndarray -> CHW float/255
  (used by the reference TestDataset, utils/dataset_utils.py:10,158);
* ``torchvision.utils.make_grid`` — simple row-major grid concat
  (utils/image_io.py:122, only used when --save_imgs);
* ``skimage.metrics.peak_signal_noise_ratio`` — 10*log10(dr^2 / mse);
* ``skimage.metrics.structural_similarity`` — the documented defaults:
  uniform 7x7 window, K1=.01/K2=.03, sample covariance (N/(N-1)),
  (win-1)//2 border crop, per-channel mean via ``channel_axis``
  (utils/val_utils.py:3,63-64);
* ``skvideo.measure.niqe`` — routed to ops/niqe.py (only compute_niqe uses
  it, utils/val_utils.py:69-74; not on the test.py path).

``install()`` registers whichever of the three packages is not importable;
real installations always win. Only parity tooling imports this module.
"""

from __future__ import annotations

import sys
import types

import numpy as np


# ---------------------------------------------------------------------------
# numpy metric implementations (skimage semantics)
# ---------------------------------------------------------------------------


def peak_signal_noise_ratio(image_true, image_test, data_range=None):
    image_true = np.asarray(image_true, dtype=np.float64)
    image_test = np.asarray(image_test, dtype=np.float64)
    if data_range is None:
        data_range = image_true.max() - image_true.min()
    mse = np.mean((image_true - image_test) ** 2)
    return 10.0 * np.log10((float(data_range) ** 2) / max(mse, 1e-300))


def _ssim_single(x, y, win, data_range):
    """skimage.structural_similarity for ONE 2-D channel, defaults."""
    from numpy.lib.stride_tricks import sliding_window_view

    def ufilt(a):
        v = sliding_window_view(a, (win, win))
        return v.mean(axis=(-2, -1))

    npix = win * win
    cov_norm = npix / (npix - 1)
    ux, uy = ufilt(x), ufilt(y)
    uxx, uyy, uxy = ufilt(x * x), ufilt(y * y), ufilt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    return s.mean()


def structural_similarity(im1, im2, win_size=7, data_range=None,
                          channel_axis=None, **_unused):
    im1 = np.asarray(im1, dtype=np.float64)
    im2 = np.asarray(im2, dtype=np.float64)
    if data_range is None:
        data_range = im1.max() - im1.min()
    if channel_axis is not None:
        im1 = np.moveaxis(im1, channel_axis, 0)
        im2 = np.moveaxis(im2, channel_axis, 0)
        return float(np.mean([
            _ssim_single(im1[c], im2[c], win_size, float(data_range))
            for c in range(im1.shape[0])]))
    return float(_ssim_single(im1, im2, win_size, float(data_range)))


# ---------------------------------------------------------------------------
# torch DCNv2 stand-in (parity tooling)
# ---------------------------------------------------------------------------


def torch_modulated_deform_conv2d(x, offset, mask, weight, bias=None,
                                  stride=1, padding=1, dilation=1):
    """Pure-torch DCNv2 forward (``mmcv.ops.modulated_deform_conv2d``
    semantics) for the reference side of parity runs: the reference ships
    its DCN forward as ``assert False`` with the mmcv import commented out
    (reference net/utils/deform_conv.py:7, 64-67), so its DGRN cannot train
    at all upstream. This is an independent differentiable implementation
    (bilinear gather, zero out-of-bounds), NOT a port of mmcv's CUDA kernel,
    with the same layout our JAX composite consumes (ops/deform_conv.py):
    offsets ``[B, 2K, Ho, Wo]`` as all K Δy's then all K Δx's (the layout
    the reference offset head produces via ``cat((o1, o2), dim=1)``),
    ``mask`` already sigmoided, weight ``[Cout, Cin, kh, kw]`` (torch OIHW).
    """
    import torch

    B, Cin, H, W = x.shape
    Cout, _, kh, kw = weight.shape
    K = kh * kw
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    dt = x.dtype
    by = torch.arange(Ho, dtype=dt) * stride - padding
    bx = torch.arange(Wo, dtype=dt) * stride - padding
    ty = (torch.arange(kh, dtype=dt) * dilation).repeat_interleave(kw)
    tx = (torch.arange(kw, dtype=dt) * dilation).repeat(kh)

    oy = offset[:, :K].permute(0, 2, 3, 1)            # [B, Ho, Wo, K]
    ox = offset[:, K:].permute(0, 2, 3, 1)
    yy = by.view(1, Ho, 1, 1) + ty.view(1, 1, 1, K) + oy
    xx = bx.view(1, 1, Wo, 1) + tx.view(1, 1, 1, K) + ox

    y0 = torch.floor(yy)
    x0 = torch.floor(xx)
    fy = (yy - y0).reshape(B, 1, -1)
    fx = (xx - x0).reshape(B, 1, -1)
    flat = x.reshape(B, Cin, H * W)

    def corner(yi, xi):
        valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
        yc = yi.clamp(0, H - 1).long()
        xc = xi.clamp(0, W - 1).long()
        idx = (yc * W + xc).reshape(B, 1, -1).expand(B, Cin, -1)
        return flat.gather(2, idx) * valid.reshape(B, 1, -1).to(dt)

    samp = (corner(y0, x0) * (1 - fy) * (1 - fx)
            + corner(y0, x0 + 1) * (1 - fy) * fx
            + corner(y0 + 1, x0) * fy * (1 - fx)
            + corner(y0 + 1, x0 + 1) * fy * fx)       # [B, Cin, P*K]
    samp = samp.reshape(B, Cin, Ho * Wo, K)
    samp = samp * mask.permute(0, 2, 3, 1).reshape(B, 1, Ho * Wo, K)
    out = torch.einsum("bcpk,ock->bop", samp, weight.reshape(Cout, Cin, K))
    if bias is not None:
        out = out + bias.view(1, Cout, 1)
    return out.reshape(B, Cout, Ho, Wo)


# ---------------------------------------------------------------------------
# installers
# ---------------------------------------------------------------------------


def _importable(name: str) -> bool:
    try:
        __import__(name)
        return True
    except ImportError:
        return False


def _install_torchvision() -> None:
    import torch

    class ToTensor:
        """HWC ndarray (or PIL image) -> CHW float tensor; /255 for uint8
        (torchvision.transforms.ToTensor semantics)."""

        def __call__(self, pic):
            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(np.ascontiguousarray(
                arr.transpose(2, 0, 1)))
            if arr.dtype == np.uint8:
                return t.float().div(255.0)
            return t.float()

    def make_grid(tensor, nrow=8, padding=2, **_unused):
        if isinstance(tensor, (list, tuple)):
            tensor = torch.stack(tensor, 0)
        if tensor.dim() == 3:
            tensor = tensor[None]
        b, c, h, w = tensor.shape
        ncol = min(nrow, b)
        nr = -(-b // ncol)
        grid = tensor.new_zeros((c, nr * (h + padding) + padding,
                                 ncol * (w + padding) + padding))
        for i in range(b):
            r, cl = divmod(i, ncol)
            grid[:, padding + r * (h + padding):padding + r * (h + padding) + h,
                 padding + cl * (w + padding):padding + cl * (w + padding) + w] \
                = tensor[i]
        return grid

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    utils_mod = types.ModuleType("torchvision.utils")
    transforms.ToTensor = ToTensor
    utils_mod.make_grid = make_grid
    tv.transforms = transforms
    tv.utils = utils_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.utils"] = utils_mod


def _install_skimage() -> None:
    sk = types.ModuleType("skimage")
    metrics_mod = types.ModuleType("skimage.metrics")
    metrics_mod.peak_signal_noise_ratio = peak_signal_noise_ratio
    metrics_mod.structural_similarity = structural_similarity
    sk.metrics = metrics_mod
    sys.modules["skimage"] = sk
    sys.modules["skimage.metrics"] = metrics_mod


def _install_skvideo() -> None:
    def niqe(images):
        from ..ops import niqe as niqe_ops

        arr = np.asarray(images, dtype=np.float64)
        if arr.ndim == 3:
            arr = arr[None]
        return np.asarray([float(niqe_ops.compute_niqe(a)) for a in arr])

    sv = types.ModuleType("skvideo")
    measure = types.ModuleType("skvideo.measure")
    measure.niqe = niqe
    sv.measure = measure
    sys.modules["skvideo"] = sv
    sys.modules["skvideo.measure"] = measure


def install() -> None:
    """Install timm + torchvision + skimage + skvideo shims (each skipped
    when the real package imports)."""
    from . import timm_shim

    timm_shim.install()
    if not _importable("torchvision"):
        _install_torchvision()
    if not _importable("skimage"):
        _install_skimage()
    if not _importable("skvideo"):
        _install_skvideo()
