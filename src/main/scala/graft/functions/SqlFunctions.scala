package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-text surface for the native codegen kernels — `spark.sql`
  * parity for what the Column API already exposes (§2.14): after
  * `SqlFunctions.register(spark)`,
  *
  *   SELECT graft_simhash(graft_shingles(split(text, ' '), 3), 64)
  *   FROM docs
  *
  * plans the SAME whole-stage-codegen expressions as the
  * Column-level pipeline (no UDF wrapping, no re-implementation —
  * the registry builder constructs the identical catalyst nodes, so
  * SQL-text and Column queries are plan-identical). Integer
  * parameters must be literals (they parameterize generated code).
  *
  * Reference surface: pydatalake exposes its scalar helpers only
  * through DuckDB SQL (`src/pydala/table.py` registers the Arrow
  * table and delegates); this is the Spark-native equivalent with
  * the engine's own kernels. */
object SqlFunctions {

  private def intArg(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case o => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $o")
    }
  }

  /** (name, builder) for every registered function. */
  private def builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    // text kernels
    "graft_charfold" -> { args =>
      require(args.size == 2, "graft_charfold(str, base)")
      CharFoldExpr(args.head, intArg(args(1), "base"))
    },
    "graft_shingles" -> { args =>
      require(args.size == 2,
        "graft_shingles(array<string> tokens, n)")
      ShinglePackAllExpr(args.head, intArg(args(1), "n"))
    },
    "graft_simhash" -> { args =>
      require(args.size == 2, "graft_simhash(array<long>, bits)")
      SimHashExpr(args.head, intArg(args(1), "bits"))
    },
    // vector kernels
    "graft_dot" -> { args =>
      require(args.size == 2, "graft_dot(vec, vec)")
      DotProductExpr(args.head, args(1))
    },
    "graft_l2sq" -> { args =>
      require(args.size == 2, "graft_l2sq(vec, vec)")
      L2SqExpr(args.head, args(1))
    },
    // media kernels (binary metadata probes)
    "graft_media_dims" -> { args =>
      require(args.size == 1, "graft_media_dims(binary)")
      MediaDimsPackExpr(args.head, maxScan = 1 << 16)
    },
    "graft_zip_info" -> { args =>
      require(args.size == 1, "graft_zip_info(binary)")
      ZipInfoExpr(args.head, maxEntries = 4096)
    }
  )

  /** Install every kernel as a session temp function. Idempotent
    * (createOrReplace); call once per session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      org.apache.spark.sql.GraftSqlBridge
        .registerSqlFunction(spark, name, b)
    }
}
