package graft

import org.apache.spark.sql.{GraftBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.plans.AsOfJoinStrategy

/** `spark.sql.extensions=graft.GraftExtensions` wiring: the extension
  * must inject both custom functions and the as-of planner strategy into
  * a session being constructed. Verified against the extension-build
  * steps directly (a second SparkContext per JVM isn't possible, so we
  * don't boot a whole configured session). */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects dot_f32, word_ngrams, and the asof strategy") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)

    val strategies = GraftBridge.plannerStrategies(ext, spark)
    assert(strategies.contains(AsOfJoinStrategy))

    val reg = GraftBridge.registerFunctions(
      ext, GraftBridge.freshFunctionRegistry())
    assert(reg.functionExists(new FunctionIdentifier("dot_f32")))
    assert(reg.functionExists(new FunctionIdentifier("word_ngrams")))
    // the first AGGREGATE through injectFunction (the analyzer wraps
    // the bare AggregateFunction) — regressions here would only hit
    // spark.sql.extensions users, invisible to register()-path tests
    assert(reg.functionExists(new FunctionIdentifier("topk_by_long")))
  }
}
