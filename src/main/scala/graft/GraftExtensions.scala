package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions._

/** SQL surface for the engine's native kernels: registers every
  * custom Catalyst expression as a `graft_*` SQL function, so pure-SQL
  * users (`spark.sql`, JDBC/Thrift, notebooks) get the same codegen'd
  * primitives the Scala API composes — tokenization, shingle/MinHash/
  * SimHash hashing, vector ops, the splittable hash and the document
  * time extractor.
  *
  * Two activation paths:
  *   - config: `spark.sql.extensions=graft.GraftExtensions` (applied
  *     at session construction — the standard library entry point);
  *   - runtime: `GraftExtensions.register(spark)` on a live session.
  *
  * Registration is idempotent (registerFunction overwrites).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType)   => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal")
  }

  private def one(fn: String, args: Seq[Expression]): Expression = {
    require(args.length == 1, s"$fn expects 1 argument, got ${args.length}")
    args.head
  }

  /** (identifier, info, builder) triples in the shape
    * SparkSessionExtensions.injectFunction consumes.
    */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    def d(name: String, usage: String)(builder: Seq[Expression] => Expression) =
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftExtensions", null, name, usage, ""),
        builder)

    Seq(
      d("graft_tokens",
        "graft_tokens(text[, case_sensitive]) - seq-db text tokenizer: " +
        "runs of letters/digits/_/*, lower-cased unless case_sensitive") { args =>
        args match {
          case Seq(t) => TokenizeExpr(t, lowerCase = true)
          case Seq(t, Literal(cs: Boolean, _)) => TokenizeExpr(t, lowerCase = !cs)
          case _ => throw new IllegalArgumentException(
            "graft_tokens(text[, case_sensitive literal]) expects 1-2 arguments")
        }
      },
      d("graft_bigram_hashes",
        "graft_bigram_hashes(tokens) - sorted distinct xxhash64 mirrors of " +
        "the token array's bigram shingles") { args =>
        BigramHashesExpr(one("graft_bigram_hashes", args))
      },
      d("graft_minhash_signature",
        "graft_minhash_signature(hashes, num_hashes) - MinHash signature over " +
        "xxhash64'd shingles; deterministic permutation coefficients") { args =>
        require(args.length == 2, "graft_minhash_signature expects 2 arguments")
        MinHashSignatureExpr(args.head,
          intLit(args(1), "graft_minhash_signature", "num_hashes"))
      },
      d("graft_minhash_band_keys",
        "graft_minhash_band_keys(hashes, num_hashes, bands) - LSH band keys " +
        "(band index packed with the band's signature hash)") { args =>
        require(args.length == 3, "graft_minhash_band_keys expects 3 arguments")
        MinHashBandKeysExpr(args.head,
          intLit(args(1), "graft_minhash_band_keys", "num_hashes"),
          intLit(args(2), "graft_minhash_band_keys", "bands"))
      },
      d("graft_simhash64",
        "graft_simhash64(hashes) - 64-bit SimHash over xxhash64 token hashes") { args =>
        SimHash64Expr(one("graft_simhash64", args))
      },
      d("graft_simhash_portable64",
        "graft_simhash_portable64(tokens) - SQL-portable 64-bit SimHash " +
        "(poly-31 token hash + affine bit mixes, replayable in ANSI SQL)") { args =>
        SimHashPortable64Expr(one("graft_simhash_portable64", args))
      },
      d("graft_portable_hash",
        "graft_portable_hash(str) - poly-31 string hash (the SQL-portable " +
        "hash SimHash builds on)") { args =>
        PortableHashExpr(one("graft_portable_hash", args))
      },
      d("graft_dot",
        "graft_dot(a, b) - dot product of two double arrays") { args =>
        require(args.length == 2, "graft_dot expects 2 arguments")
        DotProductExpr(args.head, args(1))
      },
      d("graft_sorted_intersect_count",
        "graft_sorted_intersect_count(a, b) - two-pointer intersection size " +
        "of two SORTED long arrays") { args =>
        require(args.length == 2, "graft_sorted_intersect_count expects 2 arguments")
        SortedIntersectCountExpr(args.head, args(1))
      },
      d("graft_lsh_buckets",
        "graft_lsh_buckets(vec, n_bits) - random-hyperplane LSH bucket id " +
        "(deterministic planes)") { args =>
        require(args.length == 2, "graft_lsh_buckets expects 2 arguments")
        LshBucketsExpr(args.head, intLit(args(1), "graft_lsh_buckets", "n_bits"))
      },
      d("graft_mix64",
        "graft_mix64(x) - splittable 64-bit finalizer (splitmix64); the " +
        "deterministic priority hash behind split/sample/mix") { args =>
        Mix64Expr(one("graft_mix64", args))
      },
      d("graft_nfc_fold",
        "graft_nfc_fold(str) - NFC normalize + locale-free simple case fold") { args =>
        NfcFoldExpr(one("graft_nfc_fold", args))
      },
      d("graft_doc_time",
        "graft_doc_time(json) - extract the document timestamp from the " +
        "timestamp/time/ts fields (ES, RFC3339Nano, RFC3339 formats); " +
        "returns struct(ms, s)") { args =>
        DocTimeExpr(one("graft_doc_time", args),
          keys = graft.ingest.BulkIngest.TimeFields, noZoneIsUtc = true)
      }
    )
  }

  /** Register on a live session (the config path only applies at
    * session construction). */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
