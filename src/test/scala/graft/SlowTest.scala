package graft

import org.scalatest.Tag

/** Marks the end-to-end / sf-fixture determinism tests that dominate
  * the full suite's wall-clock. Two-tier workflow (README "Tests"):
  *
  *   sbt "testOnly * -- -l graft.SlowTest"   # fast inner loop
  *   sbt test                                # full tier — the gate
  *
  * The full tier is ALWAYS the shipping gate; the fast tier exists so
  * the final-HEAD full-suite ritual never gets skipped for cost.
  */
object SlowTest extends Tag("graft.SlowTest")
