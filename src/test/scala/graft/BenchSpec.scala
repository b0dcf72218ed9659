package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-7 verdict #1: the contamination heuristic must be replay-tested
  * against the recorded BENCH_r07 run (contaminated, but self-reported
  * clean) and against the judge's idle re-run (clean). */
class BenchSpec extends AnyFunSuite {

  private val floor = Map(
    "total_min" -> 5.67,
    "q1_pricing_summary" -> 0.26, "q2_filter_project" -> 0.18,
    "q3_topk_orders" -> 0.13, "q4_segment_revenue" -> 0.67,
    "q5_nation_revenue" -> 0.83, "q6_forecast_revenue" -> 0.24,
    "q9_window_rank" -> 0.37, "q13_events_hourly" -> 0.26,
    "d1_dedup_exact" -> 0.33, "d6_minhash_dedup" -> 1.87,
    "e1_ann_bruteforce" -> 0.42)

  // Per-query minimums recorded by the contaminated round-7 driver run
  // (BENCH_r07.json): q6 20.9 s vs 0.24 s idle, q9 2.46 s vs 0.37 s, etc.
  private val r7Min = Map(
    "q1_pricing_summary" -> 0.33, "q2_filter_project" -> 0.23,
    "q3_topk_orders" -> 0.19, "q4_segment_revenue" -> 2.18,
    "q5_nation_revenue" -> 1.49, "q6_forecast_revenue" -> 20.9,
    "q9_window_rank" -> 2.46, "q13_events_hourly" -> 1.12,
    "d1_dedup_exact" -> 2.07, "d6_minhash_dedup" -> 8.64,
    "e1_ann_bruteforce" -> 1.05)

  // Judge-verified idle re-run minimums (VERDICT r7 performance table).
  private val idleMin = Map(
    "q1_pricing_summary" -> 0.26, "q2_filter_project" -> 0.20,
    "q3_topk_orders" -> 0.14, "q4_segment_revenue" -> 0.67,
    "q5_nation_revenue" -> 0.83, "q6_forecast_revenue" -> 0.24,
    "q9_window_rank" -> 0.44, "q13_events_hourly" -> 0.26,
    "d1_dedup_exact" -> 0.34, "d6_minhash_dedup" -> 1.87,
    "e1_ann_bruteforce" -> 0.42)

  test("r7's contaminated run is flagged (sustained load defeated the old heuristics)") {
    // r7's load1 stayed 1-3 the whole run and median≈min on the slow
    // queries (q6 med/min = 1.05) — both round-7 heuristics missed it.
    // The absolute floor must catch it regardless.
    val totalMin = r7Min.values.sum // ≈ 40.7 s vs 5.67 s floor
    val ratios = Seq(1.1, 1.05, 1.1, 5.8, 4.9, 1.05, 14.1, 1.5, 1.3, 4.0, 2.1)
    assert(Bench.contaminationVerdict(
      r7Min, totalMin, floor, floorApplies = true,
      loadBefore = 1.5, loads = Seq(1.5, 2.0, 3.0, 2.5, 1.8), medMinRatios = ratios,
      cpus = 32))
  }

  test("two queries over 5x floor flags even when the total stays under 3x") {
    val mins = idleMin + ("q6_forecast_revenue" -> 1.5) + ("q9_window_rank" -> 2.0)
    val totalMin = mins.values.sum // ≈ 8.8 s < 3x floor total
    assert(Bench.contaminationVerdict(
      mins, totalMin, floor, floorApplies = true,
      loadBefore = 0.5, loads = Seq(0.5, 1.0), medMinRatios = Seq(1.1, 1.2),
      cpus = 32))
  }

  test("the idle judge re-run is NOT flagged") {
    val totalMin = idleMin.values.sum // 5.67-6.2 s
    assert(!Bench.contaminationVerdict(
      idleMin, totalMin, floor, floorApplies = true,
      loadBefore = 0.2, loads = Seq(0.2, 1.1, 2.3, 1.9), medMinRatios = Seq(1.1, 1.15, 1.2, 1.05),
      cpus = 32))
  }

  test("one slow query alone does not flag (noise tolerance)") {
    val mins = idleMin + ("q6_forecast_revenue" -> 1.5) // 6.25x its floor
    assert(!Bench.contaminationVerdict(
      mins, mins.values.sum, floor, floorApplies = true,
      loadBefore = 0.3, loads = Seq(0.3, 1.0), medMinRatios = Seq(1.1, 1.3),
      cpus = 32))
  }

  test("relative heuristics still fire without a floor file") {
    // Pre-existing external load: loadBefore over cpus/4.
    assert(Bench.contaminationVerdict(
      idleMin, idleMin.values.sum, floor = Map.empty, floorApplies = false,
      loadBefore = 12.0, loads = Seq(12.0, 14.0), medMinRatios = Seq(1.1),
      cpus = 32))
    // Divergent median/min on most queries.
    assert(Bench.contaminationVerdict(
      idleMin, idleMin.values.sum, floor = Map.empty, floorApplies = false,
      loadBefore = 0.5, loads = Seq(0.5, 1.0), medMinRatios = Seq(4.0, 5.0, 3.5, 1.1),
      cpus = 32))
  }

  test("floor does not apply at other scale factors") {
    // Same r7 numbers but declared as a non-sf0.1 run: the absolute floor
    // must not fire (a clean sf1 run is legitimately slower than the
    // sf0.1 floor); load/divergence here are clean too.
    assert(!Bench.contaminationVerdict(
      r7Min, r7Min.values.sum, floor, floorApplies = false,
      loadBefore = 0.5, loads = Seq(0.5, 1.0), medMinRatios = Seq(1.1, 1.2),
      cpus = 32))
  }

  test("load thresholds scale with the configured cpu count") {
    // loadBefore 3.0 is benign on 32 cpus but pre-existing saturation on 8.
    assert(!Bench.contaminationVerdict(
      idleMin, idleMin.values.sum, floor, floorApplies = true,
      loadBefore = 3.0, loads = Seq(3.0), medMinRatios = Seq(1.1), cpus = 32))
    assert(Bench.contaminationVerdict(
      idleMin, idleMin.values.sum, floor, floorApplies = true,
      loadBefore = 3.0, loads = Seq(3.0), medMinRatios = Seq(1.1), cpus = 8))
  }

  // (query, median, min) replayed from the driver-committed BENCH_r08:
  // e1's median was 21x its own min (machine load mid-run) yet the
  // run-level verdict reported clean — round-9 verdict #2.
  private val r8MedMin = Seq(
    ("q1_pricing_summary", 0.2668, 0.233),
    ("q2_filter_project", 0.3016, 0.2666),
    ("q3_topk_orders", 0.1422, 0.1373),
    ("q4_segment_revenue", 0.5091, 0.50),
    ("q5_nation_revenue", 0.9367, 0.6758),
    ("q6_forecast_revenue", 0.1391, 0.1263),
    ("q9_window_rank", 0.3577, 0.3102),
    ("q13_events_hourly", 0.216, 0.1995),
    ("d1_dedup_exact", 0.3738, 0.3328),
    ("d6_minhash_dedup", 2.8862, 1.9986),
    ("e1_ann_bruteforce", 34.0717, 1.584))

  // Replayed from the clean BENCH_r09 run.
  private val r9MedMin = Seq(
    ("q1_pricing_summary", 0.1836, 0.1782),
    ("q2_filter_project", 0.1599, 0.1361),
    ("q3_topk_orders", 0.1307, 0.1205),
    ("q4_segment_revenue", 0.4410, 0.4168),
    ("q5_nation_revenue", 0.5166, 0.4861),
    ("q6_forecast_revenue", 0.0991, 0.0966),
    ("q9_window_rank", 0.2211, 0.2139),
    ("q13_events_hourly", 0.1243, 0.1205),
    ("d1_dedup_exact", 0.1804, 0.1707),
    ("d6_minhash_dedup", 1.7241, 1.2504),
    ("e1_ann_bruteforce", 0.2998, 0.2948))

  test("r8's e1 outlier is flagged suspect; r9's queries are not") {
    assert(Bench.suspectQueries(r8MedMin) == Seq("e1_ann_bruteforce"))
    assert(Bench.suspectQueries(r9MedMin).isEmpty)
  }

  // Replayed from the driver-committed BENCH_r10: d6's samples were
  // [1.92, 1.61, 7.94, 9.50, 4.92] — med/min 3.06x with loadavg
  // climbing 2.35→4.14 across its iterations — yet the 10x threshold
  // published a 4.92 s median for a ~1.6 s query (round-10 verdict
  // "what's wrong" #1).
  private val r10MedMin = Seq(
    ("q1_pricing_summary", 0.2412, 0.2238),
    ("q2_filter_project", 0.1800, 0.1718),
    ("q3_topk_orders", 0.1286, 0.1137),
    ("q4_segment_revenue", 0.4900, 0.4704),
    ("q5_nation_revenue", 0.5519, 0.5006),
    ("q6_forecast_revenue", 0.1014, 0.0978),
    ("q9_window_rank", 0.2312, 0.2262),
    ("q13_events_hourly", 0.1263, 0.1203),
    ("d1_dedup_exact", 0.1811, 0.1701),
    ("d6_minhash_dedup", 4.9205, 1.6103),
    ("e1_ann_bruteforce", 0.3206, 0.3014))

  test("r10's d6 3.06x outlier is flagged for re-measurement; r9 untouched") {
    assert(Bench.suspectQueries(r10MedMin) == Seq("d6_minhash_dedup"))
    assert(Bench.suspectQueries(r9MedMin).isEmpty)
  }

  test("per-query loadavg jump past 1.5x the run-start baseline flags " +
      "for re-measurement") {
    // r10: loadBefore 2.35, d6's per-query load 4.14 > 1.5 x 2.35
    assert(Bench.loadSuspects(
      Seq(("d6_minhash_dedup", 4.14), ("q1_pricing_summary", 2.6)),
      loadBefore = 2.35) == Seq("d6_minhash_dedup"))
    // the baseline floors at 1.0: the bench's own Spark load pushing
    // load1 to 1.4 on an idle machine must not flag everything
    assert(Bench.loadSuspects(
      Seq(("q1_pricing_summary", 1.4)), loadBefore = 0.1).isEmpty)
    assert(Bench.loadSuspects(
      Seq(("q1_pricing_summary", 1.6)), loadBefore = 0.1) ==
      Seq("q1_pricing_summary"))
  }

  test("a single suspect does not flag the run; two suspects do") {
    assert(!Bench.contaminationVerdict(
      idleMin, idleMin.values.sum, floor, floorApplies = true,
      loadBefore = 0.3, loads = Seq(0.3, 1.0), medMinRatios = Seq(1.1, 1.2),
      cpus = 32, suspectCount = 1))
    assert(Bench.contaminationVerdict(
      idleMin, idleMin.values.sum, floor, floorApplies = true,
      loadBefore = 0.3, loads = Seq(0.3, 1.0), medMinRatios = Seq(1.1, 1.2),
      cpus = 32, suspectCount = 2))
  }

  test("sub-10ms mins are excluded from the suspect flag (noise)") {
    assert(Bench.suspectQueries(
      Seq(("tiny", 0.09, 0.005), ("real", 2.0, 0.1))).== (Seq("real")))
  }

  test("fmt is locale-independent") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(Bench.fmt(1.2345) == "1.2345")
    } finally java.util.Locale.setDefault(prev)
  }

  test("parseFlatJson reads the committed BENCH_FLOOR.json") {
    val parsed = Bench.loadFloor("BENCH_FLOOR.json")
    assert(parsed.get("total_min").contains(5.67))
    assert(parsed.get("q6_forecast_revenue").contains(0.24))
    assert(parsed.size == 12)
  }
}
