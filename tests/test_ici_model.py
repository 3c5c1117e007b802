"""Analytic ICI-traffic model (parallel/ici_model.py) — the predictive
counterpart of the virtual-CPU scaling curve (VERDICT r2, weak item 2)."""

import numpy as np

from mppi_generic_tpu.parallel import ici_model


def test_vanilla_payload_exact():
    t = ici_model.solve_traffic_bytes(T=100, C=2)
    assert t["baseline_pmin_or_pmax"] == 4
    assert t["normalizer_psum"] == 4
    assert t["weighted_mean_psum"] == 4 * 100 * 2
    assert t["total"] == 808
    assert t["collective_phases"] == 2


def test_tube_doubles_payload_not_phases():
    v = ici_model.solve_traffic_bytes(T=64, C=2)
    tb = ici_model.solve_traffic_bytes(T=64, C=2, variant="tube")
    assert tb["total"] == 2 * v["total"]
    assert tb["collective_phases"] == v["collective_phases"]


def test_robust_adds_candidate_phase():
    r = ici_model.solve_traffic_bytes(T=64, C=2, variant="robust",
                                      num_candidates=9)
    assert r["candidate_eval_psum"] == 72
    assert r["collective_phases"] == 3


def test_allreduce_latency_bound_at_mppi_sizes():
    # KB payloads on 8 chips: bandwidth term is ns, latency term is us
    t = ici_model.allreduce_us(808, 8)
    lat_only = ici_model.allreduce_us(0, 8)
    assert lat_only == 14.0  # 2*(8-1)*1us
    assert t - lat_only < 0.1  # bandwidth adds <100 ns
    assert ici_model.allreduce_us(808, 1) == 0.0


def test_predicted_efficiency_monotone():
    # bigger per-chip solves -> higher efficiency; more chips -> lower
    e_small = ici_model.predicted_efficiency(26.0, 100, 2, 8)
    e_big = ici_model.predicted_efficiency(290.0, 100, 2, 8)
    assert e_big["predicted_weak_efficiency"] > \
        e_small["predicted_weak_efficiency"]
    e16 = ici_model.predicted_efficiency(290.0, 100, 2, 16)
    assert e16["predicted_weak_efficiency"] < \
        e_big["predicted_weak_efficiency"]
    # the deployment point: ~0.29 ms/solve per chip on an 8-ring >= 90%
    assert e_big["predicted_weak_efficiency"] >= 0.90


def test_traffic_table_shape():
    rows = ici_model.traffic_table(100, 2, {"vanilla": 26.0, "tube": 52.0},
                                   sizes=(2, 8))
    assert len(rows) == 4
    assert all(r["fabric"] == "ici" for r in rows)
    effs = [r["predicted_weak_efficiency"] for r in rows]
    assert all(0.0 < e <= 1.0 for e in effs)
    dcn = ici_model.traffic_table(100, 2, {"vanilla": 26.0}, sizes=(2,),
                                  dcn=True)
    assert dcn[0]["fabric"] == "dcn"
    assert dcn[0]["predicted_weak_efficiency"] < rows[0][
        "predicted_weak_efficiency"]
