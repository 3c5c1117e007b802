"""One-off probe: separate relay RTT from true device time for the real
solve. (a) wall-clock at different scan lengths (fixed-cost extraction),
(b) profiler trace device time per solve."""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bench import build_controller, closed_loop_fn

    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    for K in (1024, 8192):
        ctrl = build_controller(K=K, T=100, kernel="pallas_fused")
        cs = ctrl.init_state(jax.random.key(0, impl="rbg"))
        walls = {}
        for S in (250, 1000, 4000):
            f = closed_loop_fn(ctrl, S)
            out = f(x0, cs)
            jax.block_until_ready(out[1])
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = f(x0, cs)
                jax.block_until_ready(out[1])
                ts.append(time.perf_counter() - t0)
            walls[S] = float(np.median(ts))
            print(f"K={K} S={S:<5} wall={walls[S] * 1e3:9.2f} ms "
                  f"({walls[S] / S * 1e6:7.1f} us/solve)")
        # linear fit: wall = fixed + S * per_solve
        Ss = np.array(sorted(walls))
        ys = np.array([walls[s] for s in Ss])
        A = np.vstack([np.ones_like(Ss, dtype=float), Ss]).T
        fixed, slope = np.linalg.lstsq(A, ys, rcond=None)[0]
        print(f"K={K}: fixed={fixed * 1e3:.2f} ms/dispatch, "
              f"device={slope * 1e6:.1f} us/solve")

        # trace-based device time
        f = closed_loop_fn(ctrl, 250)
        out = f(x0, cs)
        jax.block_until_ready(out[1])
        outdir = f"/tmp/solve_trace_K{K}"
        with jax.profiler.trace(outdir):
            out = f(x0, cs)
            jax.block_until_ready(out[1])
        files = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                          recursive=True)
        from jax.profiler import ProfileData

        pd = ProfileData.from_file(files[-1])
        for plane in pd.planes:
            if not plane.name.startswith("/device:TPU"):
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                total = {}
                for e in line.events:
                    key = e.name.split(" = ")[0]
                    total.setdefault(key, [0, 0.0])
                    total[key][0] += 1
                    total[key][1] += e.duration_ns
                alldur = sum(v[1] for v in total.values())
                print(f"K={K} trace: total device {alldur / 1e6:.2f} ms "
                      f"({alldur / 250 / 1e3:.1f} us/solve)")
                for name, (n, dur) in sorted(
                        total.items(), key=lambda kv: -kv[1][1])[:10]:
                    print(f"    {name[:60]:<62} n={n:<6} "
                          f"total={dur / 1e3:9.1f} us "
                          f"({dur / 250 / 1e3:6.2f} us/solve)")


if __name__ == "__main__":
    main()
