"""Analytic ICI-traffic model for the sample-sharded MPPI solve.

The virtual-CPU scaling curve (scripts/scaling_bench.py) validates the
sharded *program* but cannot demonstrate physical speedup — the 8 virtual
devices share one socket. This module makes the multi-chip claim
*predictive* instead of hopeful: the cross-shard payload of an MPPI solve
is tiny and analytically exact, so the expected ICI efficiency follows
from published link numbers, not measurement.

What crosses chips per optimization iteration (everything else — sampling,
rollout, weights — is embarrassingly parallel over the sample axis):

* fused-solve path (ops/pallas_solve.py flash carries): one ``pmax`` of the
  running softmax max m (4 B), one ``psum`` of the rescaled normalizer d
  (4 B), one ``psum`` of the rescaled weighted sum num (4*T*C B). The pmax
  must complete before the psums' rescale factors are known -> 2 dependent
  collective phases.
* XLA epilogue path: ``pmin`` baseline (4 B), then ``psum`` eta (4 B) +
  ``psum`` weighted mean (4*T*C B) -> same 2 phases, same bytes.
* Tube-MPPI: 2x (stacked real+nominal systems share one launch, payloads
  double, phases do not).
* RMPPI adds the candidate evaluation: one ``psum`` of the per-candidate
  baseline/eta partials (num_candidates * 8 B) ahead of the augmented
  solve's own 2 phases.

Ring all-reduce cost model (the standard alpha-beta form; "How to Scale
Your Model" uses the same decomposition): for S bytes over n chips,

    t = 2*(n-1)/n * S / BW_link   +   2*(n-1) * t_hop

Published TPU v4/v5-class figures: ~45 GB/s per ICI link per direction
and ~1 us per hop (parameterizable). At MPPI payload sizes (KBs) the
*bandwidth* term is nanoseconds — the collective is pure latency, so
predicted efficiency is solve_time / (solve_time + phase latencies) and is
independent of K per chip. That is why weak scaling (constant K per chip)
is the deployment-relevant curve: at the measured 0.29 ms solve
(K=32768/chip, BENCH_r02) an 8-chip ring costs ~2*14 us of latency ->
~91% efficiency, while strong-scaling tiny solves (26 us at K=1024) are
latency-dominated by design.
"""

from __future__ import annotations


# Published per-chip interconnect figures (TPU v4-class: 6 ICI links/chip,
# ~45 GB/s per direction each; DCN via host NIC). Override per chip.
ICI_LINK_GBPS = 45.0
ICI_HOP_LATENCY_US = 1.0
DCN_GBPS = 25.0
DCN_HOP_LATENCY_US = 10.0

_F32 = 4


def solve_traffic_bytes(T: int, C: int, variant: str = "vanilla",
                        num_candidates: int = 9) -> dict:
    """Exact cross-shard payloads (bytes) of ONE optimization iteration."""
    mean_payload = _F32 * T * C
    base = {
        "baseline_pmin_or_pmax": _F32,
        "normalizer_psum": _F32,
        "weighted_mean_psum": mean_payload,
    }
    phases = 2  # baseline/max must land before the rescaled psums
    if variant == "tube":
        # stacked real+nominal systems: payloads double, phases do not
        base = {k: 2 * v for k, v in base.items()}
    elif variant == "robust":
        base = {k: 2 * v for k, v in base.items()}
        base["candidate_eval_psum"] = 2 * _F32 * num_candidates
        phases = 3  # candidate eval precedes the augmented solve
    elif variant != "vanilla":
        raise ValueError(f"unknown variant {variant}")
    base["total"] = sum(base.values())
    base["collective_phases"] = phases
    return base


def allreduce_us(nbytes: int, n_chips: int,
                 link_gbps: float = ICI_LINK_GBPS,
                 hop_us: float = ICI_HOP_LATENCY_US) -> float:
    """Ring all-reduce alpha-beta time for S bytes over n chips (us)."""
    if n_chips <= 1:
        return 0.0
    bw_term = 2.0 * (n_chips - 1) / n_chips * nbytes / (link_gbps * 1e3)
    lat_term = 2.0 * (n_chips - 1) * hop_us
    return bw_term + lat_term


def predicted_efficiency(solve_us: float, T: int, C: int, n_chips: int,
                         variant: str = "vanilla", num_iters: int = 1,
                         link_gbps: float = ICI_LINK_GBPS,
                         hop_us: float = ICI_HOP_LATENCY_US) -> dict:
    """Predicted weak-scaling efficiency: per-chip compute time held
    constant (fixed K per chip), collectives added on top. ``solve_us`` is
    the measured single-chip per-solve device time at the per-chip K."""
    traffic = solve_traffic_bytes(T, C, variant)
    phases = traffic["collective_phases"]
    # per phase the payloads in flight fuse into one all-reduce; the big
    # mean psum dominates the bandwidth term
    per_phase_bytes = traffic["total"] / phases
    coll_us = num_iters * phases * allreduce_us(
        int(per_phase_bytes), n_chips, link_gbps, hop_us
    )
    eff = solve_us / (solve_us + coll_us) if solve_us > 0 else 0.0
    return {
        "variant": variant,
        "n_chips": n_chips,
        "payload_bytes_per_iter": traffic["total"],
        "collective_phases": phases,
        "collective_us": round(coll_us, 3),
        "solve_us": solve_us,
        "predicted_weak_efficiency": round(eff, 4),
    }


def traffic_table(T: int, C: int, solve_us_by_variant: dict,
                  sizes=(2, 4, 8, 16, 32), num_iters: int = 1,
                  dcn: bool = False) -> list:
    """The SCALING artifact's predictive table: one row per (variant, n)."""
    link = DCN_GBPS if dcn else ICI_LINK_GBPS
    hop = DCN_HOP_LATENCY_US if dcn else ICI_HOP_LATENCY_US
    rows = []
    for variant, solve_us in solve_us_by_variant.items():
        for n in sizes:
            row = predicted_efficiency(
                solve_us, T, C, n, variant, num_iters, link, hop
            )
            row["fabric"] = "dcn" if dcn else "ici"
            rows.append(row)
    return rows
