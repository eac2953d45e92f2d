"""RD-optimized encoder tests: conformance (bit-exact decode of RDO
streams) and RD improvement over the fixed-decision encoder.

Counterpart of the reference's EncoderCore/Algo_* behavior
(/root/reference/libde265/encoder/encoder-core.h:82-130): the RDO search
must produce conforming streams and strictly better rate-distortion
operating points than deterministic mode cycling.
"""
import os
import subprocess

import numpy as np
import pytest

REF_DEC = os.path.join(os.path.dirname(__file__), "..",
                       ".ref_build", "dec265", "dec265")


def make_frames(n, W, H, seed=3):
    """Natural-ish content: gradient + texture + a moving bright box."""
    rng = np.random.RandomState(seed)
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    base = (xs * 0.7 + ys * 0.4).astype(np.float32)
    tex = rng.randint(-12, 12, (H, W)).astype(np.float32)
    frames = []
    for t in range(n):
        y = base + tex + 30 * np.sin(xs / 17.0 + t * 0.5)
        bx, by = 10 + 6 * t, 14 + 4 * t
        y[by:by + 20, bx:bx + 20] += 70
        y = np.clip(y % 256, 0, 255).astype(np.uint8)
        u = np.clip(120 + (xs[::2, ::2] * 0.2)
                    + rng.randint(-4, 4, (H // 2, W // 2)), 0, 255) \
            .astype(np.uint8)
        v = np.clip(110 + (ys[::2, ::2] * 0.1), 0, 255).astype(np.uint8)
        frames.append([y, u, v])
    return frames


def _encode(frames, rdo, **kw):
    from libde265_tpu.encoder import Encoder, EncoderConfig
    cfg = EncoderConfig(width=frames[0][0].shape[1],
                        height=frames[0][0].shape[0],
                        qp=kw.pop("qp", 30), log2_ctb=5, cu_log2=4, rdo=rdo,
                        inter_mode="mv", inter_residual=True,
                        disable_deblocking=False, sao=True,
                        write_hash_sei=True, **kw)
    return Encoder(cfg).encode(frames)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255 * 255 / max(mse, 1e-9))


@pytest.mark.parametrize("variant,kw", [
    ("p", {}),
    ("b", {"b_frames": True}),
    ("2ref", {"num_ref_l0": 2}),
])
def test_rdo_stream_conformance(variant, kw, tmp_path):
    """RDO streams decode bit-exact in our decoder (closed loop) and, when
    the reference build is present, in dec265 with SEI-hash verification."""
    from libde265_tpu.api import decode_stream
    frames = make_frames(3, 96, 96)
    bs = _encode(frames, rdo=True, **kw)
    pics = decode_stream(bs)
    assert len(pics) == 3
    ours = np.concatenate([np.asarray(p).ravel()
                           for pic in pics for p in pic.planes])
    if os.path.exists(REF_DEC):
        binp = tmp_path / f"rdo_{variant}.bin"
        yuvp = tmp_path / f"rdo_{variant}.yuv"
        binp.write_bytes(bs)
        r = subprocess.run([REF_DEC, "-q", "-c", "-o", str(yuvp), str(binp)],
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        assert "mismatch" not in (r.stdout + r.stderr)
        ref = np.fromfile(yuvp, np.uint8)
        assert ref.size == ours.size and (ref == ours).all()


def test_rdo_improves_rd():
    """Same QP: RDO must cut rate AND not lose quality vs fixed decisions."""
    from libde265_tpu.api import decode_stream
    frames = make_frames(3, 96, 96)
    rd = {}
    for rdo in (False, True):
        bs = _encode(frames, rdo=rdo)
        pics = decode_stream(bs)
        p = np.mean([_psnr(np.asarray(pics[i].planes[0]), frames[i][0])
                     for i in range(3)])
        rd[rdo] = (len(bs), p)
    bits_f, psnr_f = rd[False]
    bits_r, psnr_r = rd[True]
    assert bits_r < bits_f * 0.85, (bits_r, bits_f)
    assert psnr_r > psnr_f - 0.1, (psnr_r, psnr_f)


def test_rdo_intra_only():
    """All-intra RDO: conforming and better than the fixed mode cycle."""
    from libde265_tpu.api import decode_stream
    frames = make_frames(2, 64, 64)
    sizes = {}
    for rdo in (False, True):
        bs = _encode(frames, rdo=rdo, intra_period=1)
        pics = decode_stream(bs)
        assert len(pics) == 2
        sizes[rdo] = len(bs)
    assert sizes[True] < sizes[False]


def test_estimator_constant_variant():
    """Context-constant estimator: same price for any bin order, states
    frozen (reference cabac.h:188-209 semantics)."""
    from libde265_tpu.encoder.rate_estim import (CabacEstimator,
                                                 CabacEstimatorConstant)
    ctx = [10, 1]
    e = CabacEstimatorConstant()
    for b in (1, 0, 1, 1):
        e.encode_bin(ctx, b)
    assert ctx == [10, 1]              # no adaptation
    a = CabacEstimator()
    ctx2 = [10, 1]
    for b in (1, 0, 1, 1):
        a.encode_bin(ctx2, b)
    assert ctx2 != [10, 1]             # adapting variant does move


def test_config_parameter_registry(tmp_path):
    """Typed option registry (utils/configparam.py — counterpart of
    configparam.h:47-110 + en265 string-keyed params): validation,
    string-keyed set/get, argparse projection, and the enc265 CLI."""
    import argparse
    from libde265_tpu.utils.configparam import encoder_parameters
    from libde265_tpu.encoder import EncoderConfig
    cp = encoder_parameters()
    cfg = EncoderConfig(width=64, height=64)
    cp.set_value(cfg, "qp", "33")
    assert cfg.qp == 33
    cp.set_value(cfg, "rdo", "true")
    assert cfg.rdo is True
    with pytest.raises(ValueError):
        cp.set_value(cfg, "qp", 99)
    with pytest.raises(ValueError):
        cp.set_value(cfg, "inter-mode", "bogus")
    assert "num-refs" in cp.param_names()
    ap = argparse.ArgumentParser(add_help=False)
    cp.add_to_argparser(ap)
    args = ap.parse_args(["--qp", "41", "--sao", "--num-refs", "2"])
    cfg2 = EncoderConfig(width=64, height=64)
    cp.apply_args(cfg2, args)
    assert (cfg2.qp, cfg2.sao, cfg2.num_ref_l0) == (41, True, 2)
    assert cfg2.b_frames is False          # unset options untouched

    # enc265 CLI end-to-end with auto-generated flags
    import subprocess, sys as _sys
    yuv = tmp_path / "in.yuv"
    frames = make_frames(2, 64, 64)
    with open(yuv, "wb") as f:
        for y, u, v in frames:
            f.write(y.tobytes()); f.write(u.tobytes()); f.write(v.tobytes())
    out = tmp_path / "out.bin"
    repo = os.path.join(os.path.dirname(__file__), "..")
    r = subprocess.run([_sys.executable, os.path.join(repo, "tools", "enc265.py"),
                        "-i", str(yuv), "-o", str(out), "-w", "64", "-h", "64",
                        "--qp", "30", "--sao", "--hash-sei"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    from libde265_tpu.api import decode_stream
    pics = decode_stream(out.read_bytes())
    assert len(pics) == 2


def test_rate_control(tmp_path):
    """Rate control (encoder/ratectrl.py): a target bitrate is hit within
    tolerance by per-frame QP adaptation via slice_qp_delta, and the
    stream stays conforming (dec265 SEI-hash when available)."""
    from libde265_tpu.encoder import Encoder, EncoderConfig
    from libde265_tpu.api import decode_stream
    frames = make_frames(12, 96, 96)
    fps = 25.0
    target_kbps = 400.0
    cfg = EncoderConfig(width=96, height=96, qp=30, log2_ctb=5, cu_log2=4,
                        inter_mode="mv", inter_residual=True,
                        disable_deblocking=False, sao=True,
                        write_hash_sei=True, intra_period=6,
                        bitrate_kbps=target_kbps, fps=fps)
    enc = Encoder(cfg)
    bs = enc.encode(frames)
    kbps = len(bs) * 8 * fps / len(frames) / 1000.0
    assert abs(kbps - target_kbps) / target_kbps < 0.35, kbps
    pics = decode_stream(bs)
    assert len(pics) == len(frames)
    if os.path.exists(REF_DEC):
        binp = tmp_path / "rc.bin"
        binp.write_bytes(bs)
        r = subprocess.run([REF_DEC, "-q", "-c", str(binp)],
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 0 and "mismatch" not in (r.stdout + r.stderr)
    # fixed-QP for reference: rate control must actually change the rate
    cfg2 = EncoderConfig(width=96, height=96, qp=30, log2_ctb=5, cu_log2=4,
                         inter_mode="mv", inter_residual=True,
                         disable_deblocking=False, sao=True,
                         write_hash_sei=True, intra_period=6)
    fixed = Encoder(cfg2).encode(frames)
    fixed_kbps = len(fixed) * 8 * fps / len(frames) / 1000.0
    assert abs(kbps - target_kbps) < abs(fixed_kbps - target_kbps)
