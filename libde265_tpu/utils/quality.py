"""Quality metrics: SSD/SAD/MSE/PSNR/SSIM (counterpart of
/root/reference/libde265/quality.{h,cc} + tools/yuv-distortion)."""
import numpy as np


def ssd(a, b):
    d = a.astype(np.int64) - b.astype(np.int64)
    return int((d * d).sum())


def sad(a, b):
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).sum())


def mse(a, b):
    return ssd(a, b) / a.size


def psnr(a, b, maxval=255):
    m = mse(a, b)
    if m == 0:
        return float("inf")
    return 10.0 * np.log10(maxval * maxval / m)


def psnr_yuv(planes, ref_bytes, w, h):
    ry = np.frombuffer(ref_bytes[:w * h], np.uint8).reshape(h, w)
    ru = np.frombuffer(ref_bytes[w * h:w * h + (w // 2) * (h // 2)],
                       np.uint8).reshape(h // 2, w // 2)
    rv = np.frombuffer(ref_bytes[w * h + (w // 2) * (h // 2):w * h * 3 // 2],
                       np.uint8).reshape(h // 2, w // 2)
    return [psnr(planes[0], ry), psnr(planes[1], ru), psnr(planes[2], rv)]


def ssim(a, b, c1=(0.01 * 255) ** 2, c2=(0.03 * 255) ** 2, win=8):
    """Block SSIM (win x win tiles), mean over tiles."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    h, w = a.shape
    h_t, w_t = h // win, w // win
    a = a[:h_t * win, :w_t * win].reshape(h_t, win, w_t, win)
    b = b[:h_t * win, :w_t * win].reshape(h_t, win, w_t, win)
    mu_a = a.mean((1, 3)); mu_b = b.mean((1, 3))
    var_a = a.var((1, 3)); var_b = b.var((1, 3))
    cov = (a * b).mean((1, 3)) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / \
        ((mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    return float(s.mean())
