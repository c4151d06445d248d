package graft.streaming

import java.io.File

import graft.sources.ManifestTable
import graft.sources.ManifestTable.TableBatch
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JOIN-AWARE self-maintaining mart — a rollup of `source ⋈ dim₁ ⋈ … ⋈
  * dimₙ` (a STAR: every dim equi-joins the source on its own key set)
  * materialized at (source groups × dim attributes) grain and kept
  * current INCREMENTALLY from every table's change feed, so a
  * dim-attribute dashboard rollup (the reference's ops views join
  * canonical facts to reference data before aggregating,
  * sql/07_operational_views.sql) answers from a churn-maintained table
  * with NO join at query time at all.
  *
  * Architecture — the cascade, extended through the join. The joined
  * mart J sits on top of an ordinary [[IncrementalMart]] partial P:
  *
  * {{{
  *   P = source.groupBy(allJoinKeys ++ srcGroupCols)
  *             .agg(count(*) as n_rows, sum(v) as sum_v, …)  // feed-active
  *   J = (P ⋈ dim₁ ⋈ … ⋈ dimₙ).groupBy(srcGroups ++ dimGroups)
  *             .agg(sum(n_rows), sum(sum_v), sum(cnt_v))
  * }}}
  *
  * and each refresh folds the classic multi-relation join-IVM identity,
  * SEQUENCED so each input's delta joins the inputs before it at their
  * NEW versions and the inputs after it at their OLD versions:
  *
  * {{{
  *   ΔJ = ΔP  ⋈ D₁_old ⋈ … ⋈ Dₙ_old
  *      + P_new ⋈ ΔD₁   ⋈ D₂_old ⋈ … ⋈ Dₙ_old
  *      + P_new ⋈ D₁_new ⋈ ΔD₂  ⋈ D₃_old ⋈ …
  *      + …
  *      + P_new ⋈ D₁_new ⋈ … ⋈ Dₙ₋₁_new ⋈ ΔDₙ
  * }}}
  *
  * (exact for additive aggregates because join multiplicity distributes
  * over the partial sums; every term is change-feed-sized on its delta
  * side, never a source scan). The sequencing makes a key whose fact
  * rows and several dim rows all changed in one range contribute exactly
  * once per input.
  *
  * Cost at scale: a refresh pays churn(source) to maintain P, then per
  * term churn(delta side) × match width — the 100 TB fact table is never
  * rescanned, and a dim attribute update (the classic "region renamed"
  * migration that invalidates every naive rollup) costs one bounded
  * re-join of the affected keys' PARTIALS, not their facts.
  *
  * Aggregates: the additive set (count(*), sum, and the non-null
  * `cnt_<col>` partials that derive count(col)/avg), plus declared
  * MAX/MIN extrema under the two-regime rule lifted over the join
  * (round 11): the PARTIAL carries `max_<c>`/`min_<c>` at its grain
  * (maintained by [[IncrementalMart]]'s own two-regime machinery), and
  * the joined fold takes the monotone fast path per group — new
  * extremum = greatest/least(stored, insert-side candidates from the
  * sequenced contribution terms) — falling back, ONLY for groups a
  * retraction touched (a fact delete/update preimage, a dim
  * delete/attribute migration), to an exact recompute over
  * `P_new ⋈ dims_new` at PARTIAL grain: the fact table is never
  * rescanned even for `MAX(load_ts)`-shaped views through the star
  * (max/min are multiplicity-invariant, so the join changes nothing
  * about their algebra).
  *
  * Freshness is two-stamped: `jmartSourceVersion` is the SOURCE commit
  * version folded through P into J, `jmartFoldVersion` the manifest
  * version through which P's and EVERY dim's feeds are folded — the
  * query rewrite substitutes J only when no source change is newer than
  * the former and no dim change newer than the latter.
  */
object JoinedMart {

  /** Property keys the joined mart stamps on itself. The legacy
    * single-dim keys stay stamped for one-dim marts (recorded
    * declarations keep working); the star keys are authoritative —
    * per-dim fields join with ';' between dims, ',' within one.
    */
  val Source = "jmartSource"
  val Dim = "jmartDim"
  val SrcKeys = "jmartSrcKeys"
  val DimKeys = "jmartDimKeys"
  val SrcGroupCols = "jmartSrcGroupCols"
  val DimGroupCols = "jmartDimGroupCols"
  val ValueCols = "jmartValueCols"
  val MaxCols = "jmartMaxCols"
  val MinCols = "jmartMinCols"
  val Partial = "jmartPartial"
  val SourceVersion = "jmartSourceVersion"
  val FoldVersion = "jmartFoldVersion"
  val Dims = "jmartDims"
  val DimSrcKeysAll = "jmartDimSrcKeysAll"
  val DimKeysAll = "jmartDimKeysAll"
  val DimGroupsAll = "jmartDimGroupsAll"
  val DimRootsAll = "jmartDimRootsAll"
  val DimFoldAll = "jmartDimFoldAll"

  /** One dimension of the star: `dim` equi-joins the source on
    * `srcKeys(i) = dimKeys(i)` and contributes `groupCols` attributes
    * to the mart's grain. `root` points at ANOTHER namespace root when
    * the dim lives outside the mart's — reference/dimension data shared
    * across warehouses (the Snowflake cross-database join shape): its
    * feed and snapshots read from THAT root, folded under a per-dim
    * watermark since version counters are per-root.
    */
  final case class DimSpec(table: String, srcKeys: Seq[String],
      dimKeys: Seq[String], groupCols: Seq[String],
      root: Option[String] = None)

  /** `CREATE/REFRESH` verb (`CALL graft.system.refresh_joined_mart`):
    * bring the single-dim joined mart current through the manifest head —
    * first call records the declaration and builds base state, later
    * calls may omit the column lists and fold only the unseen feed
    * ranges. Returns the manifest version the mart is now current
    * through. Idempotent: a repeated call folds an empty range and
    * commits nothing.
    */
  def refresh(spark: SparkSession, root: File, source: String, dim: String,
      mart: String, srcKeys: Seq[String] = Nil, dimKeys: Seq[String] = Nil,
      srcGroupCols: Seq[String] = Nil, dimGroupCols: Seq[String] = Nil,
      valueCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil, numBuckets: Int = 8,
      /** Publish the joined mart's OWN change feed, so even coarser
        * rollups cascade ABOVE the join (daily joined rollup → monthly)
        * with per-level cost tracking that level's churn — and the
        * rewrite rule chains onto the coarser mart the usual way. Like
        * [[IncrementalMart]], a mart already feed-active stays so.
        */
      changeFeed: Boolean = false): Long = {
    val martTs = ManifestTable.read(root)
      .map(_.table(mart)).getOrElse(ManifestTable.TableState("", Map.empty))
    def recorded(key: String): Seq[String] = martTs.props.get(key)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    def pick(passed: Seq[String], key: String): Seq[String] =
      if (passed.nonEmpty) passed else recorded(key)
    val sk = pick(srcKeys, SrcKeys)
    val dk = pick(dimKeys, DimKeys)
    require(sk.nonEmpty && sk.length == dk.length,
      s"join keys required (src=$sk, dim=$dk): mart '$mart' has no " +
        "recorded declaration yet")
    refreshStar(spark, root, source,
      Seq(DimSpec(dim, sk, dk, pick(dimGroupCols, DimGroupCols))), mart,
      pick(srcGroupCols, SrcGroupCols), pick(valueCols, ValueCols),
      pick(maxCols, MaxCols), pick(minCols, MinCols),
      numBuckets, changeFeed)
  }

  /** The STAR refresh: several dims, each joining the source on its own
    * key set. Declarations record like the single-dim verb's; later
    * calls may pass `dims` with empty column lists per entry — the
    * recorded star declaration fills them in by table name.
    */
  def refreshStar(spark: SparkSession, root: File, source: String,
      dimSpecs: Seq[DimSpec], mart: String,
      srcGroupCols: Seq[String] = Nil, valueCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil, minCols: Seq[String] = Nil,
      numBuckets: Int = 8, changeFeed: Boolean = false): Long = {
    require(dimSpecs.nonEmpty, "at least one dim required")
    require(dimSpecs.map(_.table).distinct.length == dimSpecs.length,
      s"dims must be distinct tables: ${dimSpecs.map(_.table)}")
    val m0 = ManifestTable.read(root).getOrElse(
      throw new IllegalArgumentException(s"no manifest under $root"))
    require(m0.table(source).schemaJson.nonEmpty,
      s"table '$source' does not exist")
    // a DimSpec passed with empty fields fills in from the mart's
    // RECORDED star declaration (by table name) — the re-refresh verb
    val recordedDims: Map[String, DimSpec] = {
      val p = m0.table(mart).props
      def split(k: String): Seq[Seq[String]] = p.get(k)
        .map(_.split(";", -1).toSeq.map(
          _.split(",").map(_.trim).filter(_.nonEmpty).toSeq))
        .getOrElse(Nil)
      val names = p.get(Dims)
        .map(_.split(";").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
      val roots = p.get(DimRootsAll)
        .map(_.split(";", -1).toSeq.map(_.trim)).getOrElse(Nil)
      names.zipWithIndex.map { case (n, i) =>
        def at(rows: Seq[Seq[String]]) =
          if (i < rows.length) rows(i) else Nil
        n -> DimSpec(n, at(split(DimSrcKeysAll)), at(split(DimKeysAll)),
          at(split(DimGroupsAll)),
          root = if (i < roots.length && roots(i).nonEmpty) Some(roots(i))
          else None)
      }.toMap
    }
    val dimSpecsFilled = dimSpecs.map { ds =>
      if (ds.srcKeys.nonEmpty) ds
      else recordedDims.getOrElse(ds.table, ds)
    }
    // a dim may live in ANOTHER namespace root (shared reference data);
    // its feed and snapshots read from that root under its own version
    // counter
    def dimRoot(ds: DimSpec): File =
      ds.root.map(new File(_)).getOrElse(root)
    dimSpecsFilled.foreach { ds =>
      val dm = ManifestTable.read(dimRoot(ds)).getOrElse(
        throw new IllegalArgumentException(
          s"no manifest under ${dimRoot(ds)} for dim '${ds.table}'"))
      val ts = dm.table(ds.table)
      require(ts.schemaJson.nonEmpty,
        s"table '${ds.table}' does not exist at ${dimRoot(ds)}")
      require(ts.feedFrom >= 0,
        s"dim table '${ds.table}' has no active change feed — joined-mart " +
          "maintenance folds it; write the dim with changeFeed=true")
      require(ds.srcKeys.nonEmpty && ds.srcKeys.length == ds.dimKeys.length,
        s"join keys required for dim '${ds.table}'")
    }
    val martTs = m0.table(mart)
    val sg = if (srcGroupCols.nonEmpty) srcGroupCols
      else martTs.props.get(SrcGroupCols)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val vc = if (valueCols.nonEmpty) valueCols
      else martTs.props.get(ValueCols)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    def recordedCols(key: String): Seq[String] = martTs.props.get(key)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val mx = if (maxCols.nonEmpty) maxCols else recordedCols(MaxCols)
    val mn = if (minCols.nonEmpty) minCols else recordedCols(MinCols)
    val hasExtrema = mx.nonEmpty || mn.nonEmpty
    val dims = dimSpecsFilled
    val groupCols = sg ++ dims.flatMap(_.groupCols)
    require(groupCols.nonEmpty, "at least one group column required")
    require(groupCols.distinct.length == groupCols.length,
      s"source and dim group column names must be disjoint: $groupCols")
    val partial = martTs.props.getOrElse(Partial, s"${mart}_partial")
    // an existing mart's physical layout wins over the argument — a
    // refresh must hash into the bucket space the table was built with
    val buckets = if (martTs.numBuckets > 0) martTs.numBuckets else numBuckets
    // keep an already-feed-active joined mart cascading
    val feed = changeFeed || martTs.feedFrom >= 0

    // 1. the partial mart: source rolled up to (ALL join keys × src
    //    groups), feed-active so its diffs cascade into J. refreshMart
    //    stamps the SOURCE version P (and therefore J) is current through.
    val srcV = IncrementalMart.refreshMart(spark, root, source, partial,
      groupCols = (dims.flatMap(_.srcKeys) ++ sg).distinct, valueCols = vc,
      maxCols = mx, minCols = mn,
      numBuckets = buckets, changeFeed = true)

    val m1 = ManifestTable.read(root).get
    val v1 = m1.version
    // per-dim fold watermark: a REMOTE dim's version counter is its own
    // root's, so each dim stamps the version ITS feed folded through
    // (local dims share root A's v1)
    val dimV1: Seq[Long] = dims.map(ds =>
      if (ds.root.isEmpty) v1
      else ManifestTable.read(dimRoot(ds)).map(_.version).getOrElse(0L))
    val qid = EventPipeline.currentQueryId(spark)
    val legacy =
      if (dims.length != 1) Map.empty[String, String]
      else Map(
        Dim -> dims.head.table,
        SrcKeys -> dims.head.srcKeys.mkString(","),
        DimKeys -> dims.head.dimKeys.mkString(","),
        DimGroupCols -> dims.head.groupCols.mkString(","))
    val props = legacy ++ Map(
      Source -> source, Partial -> partial,
      Dims -> dims.map(_.table).mkString(";"),
      DimSrcKeysAll -> dims.map(_.srcKeys.mkString(",")).mkString(";"),
      DimKeysAll -> dims.map(_.dimKeys.mkString(",")).mkString(";"),
      DimGroupsAll -> dims.map(_.groupCols.mkString(",")).mkString(";"),
      DimRootsAll -> dims.map(_.root.getOrElse("")).mkString(";"),
      DimFoldAll -> dimV1.map(_.toString).mkString(";"),
      SrcGroupCols -> sg.mkString(","),
      ValueCols -> vc.mkString(","),
      MaxCols -> mx.mkString(","), MinCols -> mn.mkString(","),
      SourceVersion -> srcV.toString, FoldVersion -> v1.toString)

    def keyCond(l: DataFrame, r: DataFrame, ds: DimSpec): Column =
      ds.srcKeys.zip(ds.dimKeys).map { case (a, b) => l(a) === r(b) }
        .reduce(_ && _)
    // join the partial-grain frame `p` against one frame per dim, and
    // roll up to the mart grain with the SIGN taken from whichever side
    // carries the feed's change-type column (`signed`)
    def contrib(p: DataFrame, dimFrames: Seq[DataFrame],
        signed: DataFrame): DataFrame = {
      val joined = dims.zip(dimFrames).foldLeft(p) { case (acc, (ds, d)) =>
        acc.join(d, keyCond(p, d, ds))
      }
      val sign = when(signed(ManifestTable.ChangeTypeCol)
        .isin("insert", "update_postimage"), lit(1L)).otherwise(lit(-1L))
      val sumType = (c: String) => p.schema(s"sum_$c").dataType
      joined.groupBy((sg.map(p(_)) ++ dims.zip(dimFrames).flatMap {
        case (ds, d) => ds.groupCols.map(d(_)) }): _*)
        .agg(
          sum(sign * p(IncrementalMart.RowsCol)).as("delta_rows"),
          (vc.map(c => sum(sign * p(s"sum_$c")).cast(sumType(c))
            .as(s"delta_$c"))
            // non-null counts ride the same signed fold: count(col)/avg
            // stay derivable from the JOINED mart too
            ++ vc.map(c => sum(sign * p(s"cnt_$c")).cast("long")
              .as(s"delta_cnt_$c"))
            // extrema: insert-side candidates (the monotone half) + the
            // per-group retraction count that decides the fold's regime
            ++ mx.map(c =>
              max(when(sign > 0, p(s"max_$c"))).as(s"max_$c"))
            ++ mn.map(c =>
              min(when(sign > 0, p(s"min_$c"))).as(s"min_$c"))
            ++ (if (!hasExtrema) Nil
                else Seq(sum(when(sign > 0, lit(0L)).otherwise(lit(1L)))
                  .as("delta_retracts")))): _*)
    }

    // base (re)build: one star join at PARTIAL grain — P is group-sized,
    // the dims are dims, never the fact table. Also the fallback when a
    // feed range this mart needs has aged past retention: overwrite
    // replaces the stale state wholesale in one atomic commit.
    def rebuild(overwrite: Boolean): Unit = {
      // pin EVERY read to the stamped watermark v1: a commit landing
      // between the manifest read and these table reads would otherwise
      // be included in the rebuild yet stamped unfolded — and the next
      // refresh would fold its feed range a second time
      val p = ManifestTable.readTable(spark, root.toString,
        version = Some(v1), table = partial)
      val dFrames = dims.zip(dimV1).map { case (ds, dv) =>
        ManifestTable.readTable(spark, dimRoot(ds).toString,
          version = Some(dv), table = ds.table) }
      val joined = dims.zip(dFrames).foldLeft(p) { case (acc, (ds, d)) =>
        acc.join(d, keyCond(p, d, ds))
      }
      val rows = joined
        .groupBy((sg.map(p(_)) ++ dims.zip(dFrames).flatMap {
          case (ds, d) => ds.groupCols.map(d(_)) }): _*)
        .agg(sum(p(IncrementalMart.RowsCol)).as(IncrementalMart.RowsCol),
          (vc.map(c => sum(p(s"sum_$c"))
            .cast(p.schema(s"sum_$c").dataType).as(s"sum_$c"))
            ++ vc.map(c =>
              sum(p(s"cnt_$c")).cast("long").as(s"cnt_$c"))
            // extrema at joined grain = extrema over the partial-grain
            // extrema (max/min are multiplicity-invariant: the join
            // changes nothing about their algebra)
            ++ mx.map(c => max(p(s"max_$c")).as(s"max_$c"))
            ++ mn.map(c => min(p(s"min_$c")).as(s"min_$c"))): _*)
      ManifestTable.mergeBatch(root, qid, v1,
        Seq(TableBatch(mart, rows, groupCols, buckets,
          overwrite = overwrite, changeFeed = feed, props = props)))
    }

    val v0 = martTs.props.get(FoldVersion)
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
    // per-dim previous watermarks (remote dims stamp their own root's
    // version); a legacy all-local mart recorded only FoldVersion
    val dimV0: Seq[Option[Long]] = {
      val recorded = martTs.props.get(DimFoldAll)
        .map(_.split(";", -1).toSeq.map(s =>
          scala.util.Try(s.trim.toLong).toOption)).getOrElse(Nil)
      val recordedNames = martTs.props.get(Dims)
        .map(_.split(";").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
      val byName = recordedNames.zip(recorded).toMap
      dims.map(ds => byName.get(ds.table).flatten.orElse(v0))
    }
    v0 match {
      case None => rebuild(overwrite = false)
      case Some(from) if from >= v1 &&
          dims.indices.forall(i => dimV0(i).exists(_ >= dimV1(i))) =>
        // nothing new anywhere (each input checked against ITS root)
      case Some(from) =>
        // every input's feed for the unfolded range (an input already at
        // its watermark folds an EMPTY range); any aged-out range falls
        // back to a wholesale rebuild
        val (dP, dDsRaw) =
          try (
            ManifestTable.readChangeFeed(spark, root.toString,
              from + 1, Some(v1), partial),
            dims.zipWithIndex.map { case (ds, i) =>
              ManifestTable.readChangeFeed(spark, dimRoot(ds).toString,
                dimV0(i).getOrElse(from) + 1, Some(dimV1(i)), ds.table) })
          catch {
            case _: IllegalStateException => // feed range aged out
              rebuild(overwrite = true); return v1
          }
        val dDs = dDsRaw.map(_.persist())
        try {
          // per dim: its state AT its v1 and AT its previous watermark
          // (time travel when retained, exact feed inversion when aged —
          // union BEFORE subtracting: a key inserted at v_i and updated
          // at v_j, both in the unfolded range, must reconstruct to {} at
          // the watermark; subtract-first floors the multiset at zero and
          // resurrects the pre-update row)
          val dNews = dims.zip(dimV1).map { case (ds, dv) =>
            ManifestTable.readTable(spark, dimRoot(ds).toString,
              version = Some(dv), table = ds.table) }
          val dOlds = dims.zipWithIndex.zip(dDs).zip(dNews).map {
            case (((ds, i), dD), dNow) =>
              try ManifestTable.readTable(spark, dimRoot(ds).toString,
                version = Some(dimV0(i).getOrElse(from)), table = ds.table)
              catch {
                case _: java.io.FileNotFoundException =>
                  val dCols = dNow.columns.toIndexedSeq
                  val added = dD.filter(col(ManifestTable.ChangeTypeCol)
                    .isin("insert", "update_postimage"))
                    .select(dCols.map(col): _*)
                  val removed = dD.filter(col(ManifestTable.ChangeTypeCol)
                    .isin("delete", "update_preimage"))
                    .select(dCols.map(col): _*)
                  dNow.unionAll(removed).exceptAll(added)
              }
          }
          val pNow = ManifestTable.readTable(spark, root.toString,
            version = Some(v1), table = partial)
          // ΔP against every dim AS OF the previous watermark
          val fromP = contrib(dP, dOlds, dP)
          // per dim i: the just-refreshed partial against ΔDᵢ, dims
          // BEFORE i at their new state, dims AFTER i at their old —
          // the sequencing that makes multi-input churn count once per
          // input
          val fromDs = dims.indices.map { i =>
            val frames = dims.indices.map { j =>
              if (j < i) dNews(j) else if (j == i) dDs(i) else dOlds(j)
            }
            contrib(pNow, frames, dDs(i))
          }
          // groups several terms touch must net BEFORE the fold (its
          // replace-by-key join expects one delta row per group)
          val deltas = (fromP +: fromDs).reduce(_ unionByName _)
            .groupBy(groupCols.map(col): _*)
            .agg(sum("delta_rows").as("delta_rows"),
              (vc.map(c => sum(s"delta_$c")
                .cast(fromP.schema(s"delta_$c").dataType)
                .as(s"delta_$c"))
                ++ vc.map(c => sum(s"delta_cnt_$c").cast("long")
                  .as(s"delta_cnt_$c"))
                ++ mx.map(c => max(s"max_$c").as(s"max_$c"))
                ++ mn.map(c => min(s"min_$c").as(s"min_$c"))
                ++ (if (!hasExtrema) Nil
                    else Seq(sum("delta_retracts").cast("long")
                      .as("delta_retracts")))): _*)
            .persist()
          // extrema: the IncrementalMart two-regime rule lifted over
          // the star — greatest/least with the insert-side candidates
          // for retraction-free groups; ONLY retraction-touched groups
          // recompute, and the recompute runs over P_new ⋈ dims_new at
          // PARTIAL grain (never the fact table). The driver-side total
          // keeps the insert-only path from ever planning that join.
          val extremaCols = mx.map(c => s"max_$c") ++ mn.map(c => s"min_$c")
          def withExtrema(joined: DataFrame): (DataFrame, Seq[Column]) =
            if (!hasExtrema) (joined, Nil)
            else {
              val retracts =
                deltas.agg(sum("delta_retracts")).head.getLong(0)
              if (retracts == 0L)
                (joined,
                  mx.map(c => greatest(col(s"m.max_$c"), col(s"d.max_$c"))
                    .as(s"max_$c"))
                    ++ mn.map(c => least(col(s"m.min_$c"), col(s"d.min_$c"))
                      .as(s"min_$c")))
              else {
                val rGroups = deltas.filter(col("delta_retracts") > 0)
                  .select(groupCols.map(col): _*)
                val starNew = dims.zip(dNews).foldLeft(pNow) {
                  case (acc, (ds, d)) => acc.join(d, keyCond(pNow, d, ds))
                }
                val grouped = starNew.select(
                  (sg.map(pNow(_)) ++ dims.zip(dNews).flatMap {
                    case (ds, d) => ds.groupCols.map(d(_)) }
                    ++ mx.map(c => pNow(s"max_$c"))
                    ++ mn.map(c => pNow(s"min_$c"))): _*)
                val rCondSemi = groupCols
                  .map(k => grouped(k) <=> rGroups(k)).reduce(_ && _)
                val rcAggs =
                  mx.map(c => max(col(s"max_$c")).as(s"rc_max_$c")) ++
                    mn.map(c => min(col(s"min_$c")).as(s"rc_min_$c"))
                val recomputed = grouped
                  .join(rGroups, rCondSemi, "left_semi")
                  .groupBy(groupCols.map(col): _*)
                  .agg(rcAggs.head, rcAggs.tail: _*)
                val rCond = groupCols
                  .map(k => col(s"d.$k") <=> col(s"r.$k")).reduce(_ && _)
                val j2 = joined.join(recomputed.alias("r"), rCond,
                  "left_outer")
                val sel = mx.map(c =>
                  when(col("d.delta_retracts") > 0, col(s"r.rc_max_$c"))
                    .otherwise(greatest(col(s"m.max_$c"), col(s"d.max_$c")))
                    .as(s"max_$c")) ++
                  mn.map(c =>
                    when(col("d.delta_retracts") > 0, col(s"r.rc_min_$c"))
                      .otherwise(least(col(s"m.min_$c"), col(s"d.min_$c")))
                      .as(s"min_$c"))
                (j2, sel)
              }
            }
          try IncrementalMart.foldDeltas(spark, root.toString, mart,
            groupCols, vc, buckets, changeFeed = feed, deltas,
            qid, v1, props,
            extraFields = extremaCols.map(c =>
              org.apache.spark.sql.types.StructField(c,
                deltas.schema(c).dataType)),
            extraSelect = withExtrema)
          finally { deltas.unpersist(); () }
        } finally { dDs.foreach(_.unpersist()); () }
    }
    v1
  }
}
