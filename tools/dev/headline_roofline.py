"""Roofline accounting for the headline bench program (BASELINE.md targets).

Lowers the EXACT bench.py Monte-Carlo point function at the given batch,
pulls XLA's compiled-executable cost analysis (FLOPs + bytes accessed), and
combines it with the measured slots/s into achieved GB/s / FLOP/s and % of
the v5e peaks. Prints one JSON line.

Usage (real chip): python tools/dev/headline_roofline.py [batch] [slots_per_s]
If slots_per_s is omitted the program is also run and timed here (bench.py's
pipelined protocol, min over reps).
"""
import json
import sys
import time

sys.path.insert(0, ".")

V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0
V5E_F32_TFLOPS = 49.0


def main():
    import jax
    import jax.numpy as jnp
    import bench
    from neoradium_tpu.sim.sweep import make_trial_keys

    bench.enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    point_fn = bench.build_point_fn()
    keys = make_trial_keys(7, batch)
    snr = jnp.float32(6.0)

    jfn = jax.jit(point_fn)
    compiled = jfn.lower(keys, snr).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))

    if len(sys.argv) > 2:
        slots_per_s = float(sys.argv[2])
    else:
        jax.block_until_ready(jfn(keys, snr))
        pipeline, times = 4, []
        for _ in range(4):
            t0 = time.perf_counter()
            outs = [jfn(keys, snr) for _ in range(pipeline)]
            for o in outs:
                float(o["bitErrors"].sum())
            times.append(time.perf_counter() - t0)
        slots_per_s = pipeline * batch / min(times)

    dispatches_per_s = slots_per_s / batch
    gbps = byts * dispatches_per_s / 1e9
    tflops = flops * dispatches_per_s / 1e12
    print(json.dumps({
        "batch": batch,
        "slots_per_s": round(slots_per_s, 1),
        "flops_per_slot": round(flops / batch),
        "bytes_per_slot": round(byts / batch),
        "achieved_GBps": round(gbps, 1),
        "achieved_TFLOPs": round(tflops, 2),
        "pct_hbm_roofline": round(100 * gbps / V5E_HBM_GBPS, 1),
        "pct_bf16_mxu": round(100 * tflops / V5E_BF16_TFLOPS, 1),
    }))


if __name__ == "__main__":
    main()
