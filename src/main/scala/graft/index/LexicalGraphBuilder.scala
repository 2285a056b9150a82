package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{TextFunctions => T, VectorFunctions => V}
import graft.model.{Ids, Schemas}

/** The built graph: one DataFrame per node/edge table (SURVEY.md §1.4). */
final case class GraphTables(
    sources: DataFrame,
    chunks: DataFrame,
    topics: DataFrame,
    topicMentionedIn: DataFrame,
    statements: DataFrame,
    facts: DataFrame,
    factSupports: DataFrame,
    entities: DataFrame,
    entityRelations: DataFrame) {

  /** Topic-level embedding view: one statement's embedding stands in for
    * the topic — the lexicographically-first statement id, so the pick is
    * deterministic and oracle-replayable (a bare dropDuplicates would keep
    * a partition-order-dependent row); cached once per graph — the
    * reference pre-caches topic embeddings the same way
    * (topic_beam_search.py:91-105). */
  lazy val topicEmbeddings: DataFrame = {
    val w = Window.partitionBy(col("topic_id")).orderBy(col("statement_id"))
    statements
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("topic_id"), col("embedding")).cache()
  }

  /** Topic→entity projection probed by beam entity-overlap expansion every
    * depth; cached once per graph. */
  lazy val topicEntities: DataFrame =
    statements.select(col("topic_id"), col("statement_id"))
      .join(factSupports, Seq("statement_id"))
      .join(facts.select(col("fact_id"),
        col("subject_entity_id").as("entity_id")), Seq("fact_id"))
      .select(col("topic_id"), col("entity_id")).distinct().cache()

  /** Chunk→entity projection (the SUBJECT|OBJECT … MENTIONED_IN chain:
    * reference semantic_chunk_beam_search.py:44-63 matches BOTH link types,
    * so a chunk whose facts reference an entity only as object still links
    * to it); probed by chunk-beam expansion every depth. Materialized ONCE
    * per graph as an eager localCheckpoint, not `.cache()`: the beam loop
    * scans it several times per query, and row-format checkpoint blocks
    * skip the columnar-cache decode each probe pays. */
  lazy val chunkEntities: DataFrame =
    statements.select(col("chunk_id"), col("statement_id"))
      .join(factSupports, Seq("statement_id"))
      .join(facts.select(col("fact_id"),
        explode(array(col("subject_entity_id"), col("object_entity_id")))
          .as("entity_id")), Seq("fact_id"))
      .select(col("chunk_id"), col("entity_id")).distinct()
      .localCheckpoint(true)

  /** Per-entity degree over the relation edges, both directions (reference
    * entity_context_provider.py:126-141); materialized once per graph
    * (see [[chunkEntities]] for the checkpoint-vs-cache choice). */
  lazy val entityDegrees: DataFrame =
    entityRelations.select(col("src_entity_id").as("entity_id"))
      .union(entityRelations.select(col("dst_entity_id").as("entity_id")))
      .groupBy("entity_id").agg(count(lit(1)).as("score"))
      .localCheckpoint(true)

  /** Same tables with every frame coalesced to `n` partitions — size cached
    * partitions to the data before persisting (see Tables.cachePartitions). */
  def coalesced(n: Int): GraphTables = copy(
    sources = sources.coalesce(n), chunks = chunks.coalesce(n),
    topics = topics.coalesce(n), topicMentionedIn = topicMentionedIn.coalesce(n),
    statements = statements.coalesce(n), facts = facts.coalesce(n),
    factSupports = factSupports.coalesce(n), entities = entities.coalesce(n),
    entityRelations = entityRelations.coalesce(n))

  def persistAll(): GraphTables = copy(
    sources = sources.cache(), chunks = chunks.cache(), topics = topics.cache(),
    topicMentionedIn = topicMentionedIn.cache(), statements = statements.cache(),
    facts = facts.cache(), factSupports = factSupports.cache(),
    entities = entities.cache(), entityRelations = entityRelations.cache())

  /** Write every table as parquet under `dir` (the "graph store"). */
  def write(dir: String): Unit = {
    sources.write.mode("overwrite").parquet(s"$dir/sources")
    chunks.write.mode("overwrite").parquet(s"$dir/chunks")
    topics.write.mode("overwrite").parquet(s"$dir/topics")
    topicMentionedIn.write.mode("overwrite").parquet(s"$dir/topic_mentioned_in")
    statements.write.mode("overwrite").parquet(s"$dir/statements")
    facts.write.mode("overwrite").parquet(s"$dir/facts")
    factSupports.write.mode("overwrite").parquet(s"$dir/fact_supports")
    entities.write.mode("overwrite").parquet(s"$dir/entities")
    entityRelations.write.mode("overwrite").parquet(s"$dir/entity_relations")
  }
}

object GraphTables {
  def read(s: SparkSession, dir: String): GraphTables = GraphTables(
    s.read.parquet(s"$dir/sources"),
    s.read.parquet(s"$dir/chunks"),
    s.read.parquet(s"$dir/topics"),
    s.read.parquet(s"$dir/topic_mentioned_in"),
    s.read.parquet(s"$dir/statements"),
    s.read.parquet(s"$dir/facts"),
    s.read.parquet(s"$dir/fact_supports"),
    s.read.parquet(s"$dir/entities"),
    s.read.parquet(s"$dir/entity_relations"))
}

/**
 * Indexing pipeline: documents → chunks → (stub) extraction → graph tables.
 *
 * Mirrors the reference's extract-and-build dataflow
 * (reference: lexical_graph_index.py:572-612 — chunking → proposition/topic
 * extraction → node builders → graph construction) with the LLM extractor
 * replaced by a deterministic positional extractor, so the whole DAG is
 * hash-stable (SURVEY.md §5). Every stage is one narrow transform + explode;
 * the only shuffles are the final per-table dedups (MERGE semantics —
 * reference graph_batch_client.py "allow_yield" dedup).
 *
 * Stub extraction grammar over each chunk's token array:
 *  - topic      = first token of the chunk,
 *  - statements = consecutive 8-token windows,
 *  - facts      = (first token, "near", last token) per statement,
 *  - entities   = all fact subjects/objects.
 */
/** Build-time filters (reference indexing/build/build_filters.py:14-100):
  * predicates returning TRUE for topics/statements to IGNORE during build,
  * plus a source-metadata filter — applied before node construction, so
  * filtered content never reaches the graph or the vector indexes.
  * Column-predicate form keeps them inside the build plan (pushdown-able),
  * instead of the reference's per-node Python callbacks. */
final case class BuildFilters(
    ignoreTopic: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      _ => org.apache.spark.sql.functions.lit(false),
    ignoreStatement: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      _ => org.apache.spark.sql.functions.lit(false),
    sourceFilter: Option[graft.filter.FilterAst.Filter] = None)

object LexicalGraphBuilder {

  val ChunkTokens = 32
  val ChunkOverlap = 4
  val StatementTokens = 8
  val EmbeddingDim = 64

  /** `classifications`: the (inferred or default) entity classification
    * list, typically from [[InferClassifications.infer]]. With one element
    * every entity gets it; with several, each entity value hash-picks one —
    * the deterministic stand-in for the reference's LLM choosing a class
    * from the inferred list per extraction
    * (infer_classifications.py feeding the extraction prompt). The list is
    * a bounded driver-side literal baked into the plan — the "broadcast". */
  def fromDocuments(
      docs: DataFrame,
      textCol: String,
      metadataCols: Seq[String],
      tenant: String = "t0",
      buildTs: Long = 0L,
      classifications: Seq[String] = Seq("Token"),
      buildFilters: BuildFilters = BuildFilters()): GraphTables = {

    val tn = lit(tenant)
    val sourceDocs = buildFilters.sourceFilter
      .fold(docs)(f => docs.filter(graft.filter.FilterAst.compile(f, col)))
    val base = sourceDocs.withColumn("source_id",
      Ids.sourceId(concat_ws("|", metadataCols.map(col): _*), tn))

    val sources = base.select(
      col("source_id"),
      map(metadataCols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*)
        .as("metadata"),
      lit(Schemas.TimestampLowerBound).as("valid_from"),
      lit(Schemas.TimestampUpperBound).as("valid_to"),
      lit(buildTs).as("extract_ts"),
      lit(buildTs).as("build_ts"),
      tn.as("tenant_id"))

    // Chunking: sliding token windows, stride = ChunkTokens - ChunkOverlap
    // (reference default SentenceSplitter 256/25 — lexical_graph_index.py:197).
    val stride = ChunkTokens - ChunkOverlap
    val toks = base.select(col("source_id"),
      split(T.searchStr(col(textCol)), "\\s+").as("toks"))
    val chunked = toks
      .withColumn("n", size(col("toks")))
      .withColumn("starts",
        sequence(lit(0), greatest(expr(s"((n - 1) div $stride) * $stride"), lit(0)),
          lit(stride)))
      .select(col("source_id"),
        posexplode(expr(s"transform(starts, p -> concat_ws(' ', slice(toks, p + 1, $ChunkTokens)))"))
          .as(Seq("seq", "chunk_text")))
      .filter(length(col("chunk_text")) > 0)
      .withColumn("chunk_id", Ids.chunkId(col("source_id"), col("chunk_text")))
    val wc = Window.partitionBy(col("source_id")).orderBy(col("seq"))
    val chunks = chunked
      .withColumn("prev_id", lag(col("chunk_id"), 1).over(wc))
      .withColumn("next_id", lead(col("chunk_id"), 1).over(wc))
      .select(col("chunk_id"), col("source_id"), col("chunk_text").as("text"),
        col("seq"), col("prev_id"), col("next_id"),
        V.hashEmbedding(col("chunk_text"), EmbeddingDim).as("embedding"),
        tn.as("tenant_id"))
      // MERGE semantics for the chunks node table too: a repeated window
      // text within a source shares a chunk_id — keep the first occurrence
      // (lowest seq), like the statement dedup below
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("chunk_id")).orderBy(col("seq"))))
      .filter(col("_rn") === 1).drop("_rn")

    // Stub extraction: topic + statements + facts per chunk. Ignored topics
    // drop here — before statement fan-out — so nothing downstream of a
    // filtered topic is ever built (build_filters.py topic_filter_fn).
    val withTopic = chunks.select(col("chunk_id"), col("text"))
      .withColumn("ctoks", split(col("text"), " "))
      .withColumn("topic_value", col("ctoks").getItem(0))
      .filter(!buildFilters.ignoreTopic(col("topic_value")))
      .withColumn("topic_id", Ids.topicId(col("topic_value"), tn))

    // topic_id hashes lower(trim(value)) — dedup must pick the case
    // variant deterministically (lexicographic min), not by partition order
    val topics = withTopic.select(col("topic_id"), col("topic_value").as("value"),
      tn.as("tenant_id"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("topic_id")).orderBy(col("value"))))
      .filter(col("_rn") === 1).drop("_rn")
    val topicMentionedIn = withTopic.select(col("topic_id"), col("chunk_id")).distinct()

    val stmtRaw = withTopic
      .withColumn("starts",
        sequence(lit(0), greatest((size(col("ctoks")) - 1), lit(0)), lit(StatementTokens)))
      .select(col("chunk_id"), col("topic_id"),
        posexplode(expr(s"transform(starts, p -> concat_ws(' ', slice(ctoks, p + 1, $StatementTokens)))"))
          .as(Seq("seq", "stmt_text")))
      .filter(length(col("stmt_text")) > 0)
      .filter(!buildFilters.ignoreStatement(col("stmt_text")))
      .withColumn("statement_id", Ids.statementId(col("topic_id"), col("stmt_text")))
    val ws = Window.partitionBy(col("chunk_id")).orderBy(col("seq"))
    // MERGE dedup keeps the first occurrence by (chunk_id, seq) — a bare
    // dropDuplicates would keep a partition-order-dependent row, making the
    // occurrence-dependent columns (chunk_id, prev link) non-deterministic
    // and the traversal retrievers non-replayable.
    val wDedup = Window.partitionBy(col("statement_id"))
      .orderBy(col("chunk_id"), col("seq"))
    val statements = stmtRaw
      .withColumn("prev_statement_id", lag(col("statement_id"), 1).over(ws))
      .select(col("statement_id"), col("topic_id"), col("chunk_id"),
        col("stmt_text").as("value"),
        array().cast("array<string>").as("details"),
        col("seq"), col("prev_statement_id"),
        V.hashEmbedding(col("stmt_text"), EmbeddingDim).as("embedding"))
      .withColumn("_rn", row_number().over(wDedup))
      .filter(col("_rn") === 1).drop("_rn")

    def cls(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (classifications.size == 1) lit(classifications.head)
      else element_at(typedLit(classifications),
        (pmod(graft.functions.HashFunctions.h60(v),
          lit(classifications.size.toLong)) + 1).cast("int"))

    val factRaw = stmtRaw
      .withColumn("stoks", split(col("stmt_text"), " "))
      .withColumn("subj", col("stoks").getItem(0))
      .withColumn("obj", element_at(col("stoks"), -1))
      .withColumn("subject_entity_id", Ids.entityId(col("subj"), cls(col("subj")), tn))
      .withColumn("object_entity_id", Ids.entityId(col("obj"), cls(col("obj")), tn))
      .withColumn("fact_id", Ids.factId(col("subj"), lit("near"), col("obj")))

    val facts = factRaw.select(col("fact_id"),
      concat_ws(" ", col("subj"), lit("near"), col("obj")).as("value"),
      lit("near").as("relation"),
      col("subject_entity_id"), col("object_entity_id"))
      .dropDuplicates("fact_id")
    val factSupports = factRaw.select(col("fact_id"), col("statement_id")).distinct()

    val entities = factRaw.select(col("subj").as("value"), col("subject_entity_id").as("entity_id"))
      .union(factRaw.select(col("obj"), col("object_entity_id")))
      .dropDuplicates("entity_id")
      .select(col("entity_id"), col("value"), T.searchStr(col("value")).as("search_str"),
        cls(col("value")).as("classification"))

    val entityRelations = factRaw
      .select(col("subject_entity_id").as("src_entity_id"),
        lit("NEAR").as("relation_value"),
        col("object_entity_id").as("dst_entity_id"))
      .distinct()

    GraphTables(sources, chunks, topics, topicMentionedIn, statements,
      facts, factSupports, entities, entityRelations)
  }

  val LocalEntityClass = "__Local_Entity__"

  /** Build the nine graph tables from REAL extraction output: one row per
    * chunk carrying the LLM's delimited extraction text, parsed by
    * [[TopicParser.parseExtractedTopics]] and fanned out exactly like the
    * reference's node builders (indexing/build per-label node_builder dispatch
    * over the parsed TopicCollection). This is the production twin of
    * [[fromDocuments]] — same ids, same MERGE dedup discipline, but the
    * grammar is the model's, not the stub's.
    *
    * `chunks` columns: the `metadataCols` identifying the source, `seqCol`
    * (chunk order within its source), `textCol` (chunk text), `rawCol`
    * (the extraction text). */
  def fromExtractions(
      chunksRaw: DataFrame,
      textCol: String,
      rawCol: String,
      metadataCols: Seq[String],
      seqCol: String = "seq",
      tenant: String = "t0",
      buildTs: Long = 0L): GraphTables = {
    import org.apache.spark.sql.functions.udf
    val tn = lit(tenant)
    val parse = udf((raw: String) =>
      TopicParser.parseExtractedTopics(Option(raw).getOrElse(""))._1)

    val base = chunksRaw
      .withColumn("source_id",
        Ids.sourceId(concat_ws("|", metadataCols.map(col): _*), tn))
      .withColumn("chunk_id", Ids.chunkId(col("source_id"), col(textCol)))
      .withColumn("_parsed", parse(col(rawCol)))

    val sources = base.select(
      col("source_id"),
      map(metadataCols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*)
        .as("metadata"),
      lit(Schemas.TimestampLowerBound).as("valid_from"),
      lit(Schemas.TimestampUpperBound).as("valid_to"),
      lit(buildTs).as("extract_ts"),
      lit(buildTs).as("build_ts"),
      tn.as("tenant_id")).dropDuplicates("source_id")

    val wc = Window.partitionBy(col("source_id")).orderBy(col(seqCol))
    val chunks = base
      .withColumn("prev_id", lag(col("chunk_id"), 1).over(wc))
      .withColumn("next_id", lead(col("chunk_id"), 1).over(wc))
      .select(col("chunk_id"), col("source_id"), col(textCol).as("text"),
        col(seqCol).as("seq"), col("prev_id"), col("next_id"),
        V.hashEmbedding(col(textCol), EmbeddingDim).as("embedding"),
        tn.as("tenant_id"))
      // chunk_id hashes (source, text) only: repeated chunk text at a later
      // seq must lose to the FIRST occurrence, not to partition order
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("chunk_id")).orderBy(col("seq"))))
      .filter(col("_rn") === 1).drop("_rn")

    // topic fan-out; tpos/spos order statements within the chunk
    val topicRows = base.select(col("chunk_id"),
        posexplode(col("_parsed")).as(Seq("tpos", "t")))
      .withColumn("topic_value", col("t.value"))
      .withColumn("topic_id", Ids.topicId(col("topic_value"), tn))

    val topics = topicRows
      .select(col("topic_id"), col("topic_value").as("value"),
        tn.as("tenant_id"))
      // topic_id hashes lower(trim(value)): case variants share an id, so
      // the surviving display value is the lexicographic min, not whichever
      // row a partition saw first
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("topic_id")).orderBy(col("value"))))
      .filter(col("_rn") === 1).drop("_rn")
    val topicMentionedIn = topicRows
      .select(col("topic_id"), col("chunk_id")).distinct()

    val stmtRaw = topicRows.select(col("chunk_id"), col("topic_id"),
        col("tpos"), posexplode(col("t.statements")).as(Seq("spos", "st")))
      .withColumn("stmt_text", col("st.value"))
      .withColumn("statement_id",
        Ids.statementId(col("topic_id"), col("stmt_text")))

    val ws = Window.partitionBy(col("chunk_id"))
      .orderBy(col("tpos"), col("spos"))
    val wDedup = Window.partitionBy(col("statement_id"))
      .orderBy(col("chunk_id"), col("tpos"), col("spos"))
    val statements = stmtRaw
      .withColumn("prev_statement_id", lag(col("statement_id"), 1).over(ws))
      .withColumn("_rn", row_number().over(wDedup))
      .filter(col("_rn") === 1)
      .select(col("statement_id"), col("topic_id"), col("chunk_id"),
        col("stmt_text").as("value"),
        col("st.details").as("details"),
        (col("tpos") * 10000 + col("spos")).as("seq"),
        col("prev_statement_id"),
        V.hashEmbedding(col("stmt_text"), EmbeddingDim).as("embedding"))

    val factRows = stmtRaw.select(col("statement_id"),
        explode(col("st.facts")).as("f"))
      .select(col("statement_id"),
        col("f.subject.value").as("subj_value"),
        col("f.subject.classification").as("subj_class"),
        col("f.predicate").as("predicate"),
        coalesce(col("f.obj.value"), col("f.complement.value")).as("obj_value"),
        coalesce(col("f.obj.classification"), col("f.complement.classification"))
          .as("obj_class"))
      .filter(col("obj_value").isNotNull)
      .withColumn("subject_entity_id",
        Ids.entityId(T.searchStr(col("subj_value")), col("subj_class"), tn))
      .withColumn("object_entity_id",
        Ids.entityId(T.searchStr(col("obj_value")), col("obj_class"), tn))
      .withColumn("fact_id",
        Ids.factId(col("subj_value"), col("predicate"), col("obj_value")))

    val facts = factRows.select(col("fact_id"),
        concat_ws(" ", col("subj_value"), col("predicate"), col("obj_value"))
          .as("value"),
        col("predicate").as("relation"),
        col("subject_entity_id"), col("object_entity_id"))
      // fact_id excludes the entity CLASSIFICATIONS, so the same triple
      // extracted as Paris|City vs Paris|Place shares a fact_id with
      // different entity ids — keep the smallest (entity_id, entity_id)
      // pair deterministically
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("fact_id"))
          .orderBy(col("subject_entity_id"), col("object_entity_id"))))
      .filter(col("_rn") === 1).drop("_rn")
    val factSupports = factRows
      .select(col("fact_id"), col("statement_id")).distinct()

    val entities = topicRows
      .select(explode(col("t.entities")).as("e"))
      .select(col("e.value").as("value"),
        col("e.classification").as("classification"))
      .union(factRows.select(col("subj_value"), col("subj_class")))
      .union(factRows.select(col("obj_value"), col("obj_class")))
      .withColumn("search_str", T.searchStr(col("value")))
      .withColumn("entity_id",
        Ids.entityId(col("search_str"), col("classification"), tn))
      .select("entity_id", "value", "search_str", "classification")
      // entity_id hashes (search_str, classification): raw values differing
      // only in case/punctuation share an id — keep the lexicographic min
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("entity_id")).orderBy(col("value"))))
      .filter(col("_rn") === 1).drop("_rn")

    val entityRelations = factRows
      .select(col("subject_entity_id").as("src_entity_id"),
        T.relationshipName(col("predicate")).as("relation_value"),
        col("object_entity_id").as("dst_entity_id"))
      .distinct()

    GraphTables(sources, chunks, topics, topicMentionedIn, statements,
      facts, factSupports, entities, entityRelations)
  }

  /** Local-entity rewrite (reference indexing/build/
    * local_entity_rewrites_graph_builder.py:23-75): facts and relation edges
    * that reference a `__Local_Entity__` re-point to the non-local entity
    * sharing its `search_str` when one exists; rewritten locals drop from
    * the entity table. One mapping join (local → lexicographically-first
    * non-local twin, deterministic) remapped through the referencing
    * tables — the MERGE-per-node loop becomes three hash joins. */
  def rewriteLocalEntities(g: GraphTables): GraphTables = {
    val w = Window.partitionBy(col("local_id")).orderBy(col("target_id"))
    val mapping = g.entities.filter(col("classification") === LocalEntityClass)
      .select(col("entity_id").as("local_id"), col("search_str"))
      .join(g.entities.filter(col("classification") =!= LocalEntityClass)
        .select(col("entity_id").as("target_id"), col("search_str")),
        Seq("search_str"))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select("local_id", "target_id")
    def remap(df: DataFrame, c: String): DataFrame =
      df.join(mapping.withColumnRenamed("local_id", c), Seq(c), "left")
        .withColumn(c, coalesce(col("target_id"), col(c)))
        .drop("target_id")
        .select(df.columns.toIndexedSeq.map(col): _*) // keep the table's column order
    val facts = remap(remap(g.facts, "subject_entity_id"), "object_entity_id")
    val rels = remap(remap(g.entityRelations, "src_entity_id"), "dst_entity_id")
      .distinct()
    val entities = g.entities
      .join(mapping.withColumnRenamed("local_id", "entity_id"),
        Seq("entity_id"), "left_anti")
    g.copy(facts = facts, entityRelations = rels, entities = entities)
  }
}
