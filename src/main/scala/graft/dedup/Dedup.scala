package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape:
  *
  *  - exact: one hash-shuffle on a 16-byte digest (never on the raw text —
  *    shuffling full documents would move the whole corpus).
  *  - MinHash + LSH: candidate generation via banded signature buckets; the
  *    only shuffles are on small (band, hash) keys; verification joins only
  *    within buckets, never all-pairs.
  *  - SimHash: 64-bit signature, exact-duplicate buckets by signature.
  *  - n-gram Jaccard: exact verification on LSH candidates only.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical content digest.
    * Shuffles only (digest, id) after a map-side digest — at 100 TB the
    * shuffle payload is ~32 bytes/doc regardless of document size.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact dedup keyed on the normalized word-set fingerprint — catches
    * whitespace/punctuation/word-order variants of identical content.
    */
  def byFingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature over shingles: `numHashes` permutations computed in
    * one pass by [[graft.exprs.HashExprs.MinHashSig]] (hash each shingle
    * once, affine-transform per permutation).
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    graft.exprs.HashExprs.minhash_sig(shingles, numHashes)

  /** LSH banding: signature → array of (bandIndex, bandHash) structs. Docs
    * sharing any band bucket are near-dup candidates.
    */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(signature, b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
    }: _*)

  /** Exact Jaccard similarity of two shingle arrays — single hash-set pass
    * ([[graft.exprs.HashExprs.ArrayJaccard]]).
    */
  def jaccard(a: Column, b: Column): Column =
    graft.exprs.HashExprs.array_jaccard(a, b)

  /** MinHash-LSH near-duplicate pairs.
    *
    * Plan shape (the part that must survive 100 TB):
    *  1. narrow: shingle → signature → explode bands  (no shuffle)
    *  2. shuffle on (band, bucket) — keys are 16 bytes, combiner-friendly
    *  3. self-join *within* buckets only (the LSH point: candidate count
    *     ≪ n²); bucket skew is bounded because identical docs should first
    *     be removed by [[exact]].
    *  4. exact-Jaccard verification on candidates; threshold filter.
    *
    * Returns distinct (idA, idB, jaccard) with idA < idB.
    */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
                      shingleSize: Int = 3, numHashes: Int = 16,
                      bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    // Shingling is the dominant per-row cost and this relation feeds three
    // consumers (bucket generation + both sides of the verify join), so it
    // is persisted rather than recomputed per consumer. No unpersist here:
    // the returned plan is lazy, so the cache must outlive this call —
    // CacheManager dedupes identical plans across invocations and
    // ContextCleaner reclaims the storage once unreachable. At 100 TB the
    // same role is played by a checkpoint of (id, sh) to durable storage.
    val shingled = df.select(
      col(idCol).as("id"),
      TextAnalysis.wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Candidate generation carries ONLY (id, band, bucket) — the shingle
    // arrays never enter the bucket shuffle (at 100 TB they'd dominate it).
    // Persisted because the self-join below evaluates each side
    // independently — without the cache the minhash signatures would be
    // computed twice. Rows are slim (id, band, bucket) triples.
    val buckets = shingled
      .select(col("id"),
        explode(lshBands(minhashSignature(col("sh"), numHashes),
          bands, rowsPerBand)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cand = buckets.alias("a").join(buckets.alias("b"),
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct() // pairs sharing several bands verify once, not per band
    // Verification joins the shingles back — one exact-Jaccard per pair.
    cand
      .join(shingled.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(shingled.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** EXACT Jaccard-threshold self-join via prefix filtering (the public
    * set-similarity-join technique of Chaudhuri/Ganti/Kaushik 2006 and
    * Xiao et al.'s PPJoin): identical output to a blocked all-pairs join,
    * without the quadratic hazard of joining on coarse block keys alone.
    *
    * Principle: order every document's shingles by ascending global
    * frequency; any pair with Jaccard >= t must share at least one shingle
    * within each side's first (|s| - floor(t·|s|) + 1) shingles under that
    * common order. Exploding ONLY those prefixes and equi-joining on
    * (blockCols, shingle) yields a candidate superset of the true result,
    * then each candidate pair is verified with one exact Jaccard.
    *
    * 100 TB shape: every shuffle is keyed by shingle (fine-grained;
    * frequency-ascending prefixes keep the join buckets on RARE shingles),
    * never by a coarse block column alone — a hot (source, lang) block can
    * no longer go quadratic. Candidate volume per shingle is bounded by
    * that shingle's document frequency, not the block size. The extra cost
    * vs LSH is one global token-frequency aggregation (linear, combiner-
    * friendly) — the price of exactness.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard within
    * 1e-6 of `threshold` or above (callers round and apply the exact
    * threshold; the slack means float rounding can only ADD candidates).
    */
  def jaccardPairsExact(df: DataFrame, textCol: String, idCol: String,
                        blockCols: Seq[String] = Nil, shingleSize: Int = 3,
                        threshold: Double = 0.5): DataFrame = {
    val tEff = threshold - 1e-6
    val blocks = blockCols.map(col)
    // Both slim relations feed multiple consumers (base: verify-join sides;
    // toks: frequency agg + prefix join) — persist instead of re-shingling
    // the corpus per consumer. Lazily returned plan ⇒ no unpersist (see
    // minhashLshPairs); at 100 TB this is the relation you'd checkpoint.
    val base = df.select((col(idCol).as("id") +: blocks :+
        TextAnalysis.wordShingles(col(textCol), shingleSize).as("sh")): _*)
      .filter(size(col("sh")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val toks = base.select((col("id") +: blocks :+ size(col("sh")).as("sz") :+
        explode(col("sh")).as("tok")): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    // Per-doc frequency-ascending order; keep only the pigeonhole prefix.
    // floor (not ceil) of t·sz under-counts the required overlap, so the
    // prefix is never too short — exactness is preserved at the boundary.
    val w = Window.partitionBy(col("id")).orderBy(col("cnt"), col("tok"))
    // Persisted: the a/b self-join would otherwise run the per-doc
    // frequency-sort window (a shuffle + sort) twice.
    val prefix = toks.join(freq, "tok")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <=
        col("sz") - floor(lit(tEff) * col("sz")).cast("int") + 1)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = prefix.alias("a"); val b = prefix.alias("b")
    val cond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .foldLeft(col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
        // length filter: J >= t forces t·|B| <= |A| and t·|A| <= |B|
        col("a.sz").cast("double") >= lit(tEff) * col("b.sz").cast("double") &&
        col("b.sz").cast("double") >= lit(tEff) * col("a.sz").cast("double"))(_ && _)
    val cand = a.join(b, cond)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct() // pairs sharing several prefix shingles verify once
    cand
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= tEff)
  }

  /** Per-document fraction of sentences duplicated elsewhere in the corpus —
    * the C4/Lee-et-al. sentence-level dedup signal (public technique:
    * Raffel et al. 2020 §2.2 three-sentence-span dedup, Lee et al. 2021
    * "Deduplicating Training Data..."): boilerplate-heavy documents score
    * high and get filtered or stripped before training.
    *
    * 100 TB shape: sentences leave the scan as (doc_id, md5) pairs — the
    * corpus-wide duplicate count shuffles 16-byte digests, never sentence
    * text; the join back to documents is digest-keyed. Min length filters
    * trivial sentences like C4 does.
    */
  def dupSentenceFraction(df: DataFrame, textCol: String, idCol: String,
                          minChars: Int = 20): DataFrame = {
    val sents = df.select(col(idCol).as("id"),
        explode(filter(
          transform(split(col(textCol), "[.!?]\\s+|[.!?]$"), s => trim(s)),
          s => length(s) >= minChars)).as("sent"))
      .select(col("id"), md5(lower(col("sent"))).as("h"))
      .persist(StorageLevel.MEMORY_AND_DISK) // feeds the count AND the join
    val counts = sents.groupBy(col("h"))
      .agg(countDistinct(col("id")).as("nd"))
    sents.join(counts, "h")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_sent"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup"))
      .select(col("id"),
        (col("n_dup").cast("double") / col("n_sent").cast("double"))
          .as("dup_sent_frac"))
  }

  /** Near-dup CLUSTERS from a pair list: connected components by iterative
    * min-label propagation — each doc's label converges to the smallest id
    * reachable through the pair graph, which doubles as the canonical
    * (keep) document per cluster. Returns (id, label).
    *
    * 100 TB shape: near-dup graphs are dense little cliques with tiny
    * diameter, so the loop converges in a handful of rounds; each round is
    * two shuffles of (id, label) pairs — never the documents. Lineage is
    * cut with localCheckpoint every round (iterative plans otherwise grow
    * unboundedly). For adversarial long-chain graphs the published
    * large-star/small-star algorithm (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014) halves rounds to
    * O(log n); the propagation loop here is the same join shape.
    */
  def dedupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // Symmetrized edge list; every node starts labeled with itself.
    val edges = pairs.select(col("id_a"), col("id_b"))
      .unionAll(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("id_a").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // each node adopts the min of its own and its neighbours' labels;
      // the previous label rides along so convergence is a filter over the
      // materialized result, not a second join
      val nbr = edges.join(labels, edges("id_b") === labels("id"))
        .groupBy(edges("id_a").as("id"))
        .agg(min(col("label")).as("nlabel"))
      val next0 = labels.join(nbr, Seq("id"), "left")
        .select(col("id"), col("label").as("prev"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      // persist each round (the convergence job below materializes it);
      // every 5th round localCheckpoint instead — persist keeps the logical
      // lineage growing per round, and an unbounded iterative plan is what
      // blows up analysis/canonicalization time at high iteration counts
      val next = if (i % 5 == 4) next0.localCheckpoint()
        else next0.persist(StorageLevel.MEMORY_AND_DISK)
      converged = next.filter(col("label") =!= col("prev")).isEmpty
      // the convergence job materialized `next`; the previous round's cache
      // is dead weight from here on (at 100 TB: one labels copy, not i)
      labels.unpersist()
      labels = next.drop("prev")
      i += 1
    }
    edges.unpersist()
    labels
  }

  /** 64-bit SimHash over word shingles, computed in one per-row pass by
    * [[graft.exprs.HashExprs.SimHash64]] (the column-function formulation
    * needs 64 aggregate passes per row — quadratic and codegen-hostile).
    */
  def simhash(text: Column, shingleSize: Int = 2): Column =
    graft.exprs.HashExprs.simhash64(TextAnalysis.wordShingles(text, shingleSize))

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidate pairs within identical 16-bit blocks
    * (pigeonhole: any pair within distance 3 shares at least one of 4
    * blocks). Shuffle key = (block index, block value) — small and uniform.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    // Signatures computed once into a slim (id, sig) relation; the block
    // join and the verification both reuse it (8-byte payloads only).
    // Persisted so the a/b self-join doesn't shingle + SimHash the corpus
    // twice (each self-join side is evaluated independently).
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val blocked = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map { i =>
        struct(lit(i).as("i"),
          shiftright(col("sig"), i * 16).bitwiseAND(0xFFFFL).as("v"))
      }: _*)).as("blk"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = blocked.alias("a"); val b = blocked.alias("b")
    a.join(b,
        col("a.blk.i") === col("b.blk.i") && col("a.blk.v") === col("b.blk.v") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
