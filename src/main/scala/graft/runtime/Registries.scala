package graft.runtime

import graft.api.{Registry, Source, Transform, Sink}
import graft.operators._
import graft.sinks._
import graft.sources._

/** Built-in component registries (reference: pipeline/{Extractor,Transformer,
  * Loader}Registry.scala) — type-string dispatch + user register(). */
object Registries {
  def sources(): Registry[Source] = new Registry[Source]("source", Map(
    FileSource.sourceType      -> FileSource,
    "s3"                       -> FileSource, // alias: s3a:// path with file semantics
    TableSource.sourceType     -> TableSource,
    KafkaSource.sourceType     -> KafkaSource,
    KafkaFileSource.sourceType -> KafkaFileSource,
    "postgres"                 -> new JdbcSource("postgres", "org.postgresql.Driver"),
    "mysql"                    -> new JdbcSource("mysql", "com.mysql.cj.jdbc.Driver")))

  def transforms(): Registry[Transform] = new Registry[Transform]("transform", Map(
    FilterTransform.transformType     -> FilterTransform,
    MapTransform.transformType        -> MapTransform,
    AggregateTransform.transformType  -> AggregateTransform,
    JoinTransform.transformType       -> JoinTransform,
    WindowTransform.transformType     -> WindowTransform,
    WindowRankTransform.transformType -> WindowRankTransform,
    WindowAggTransform.transformType  -> WindowAggTransform,
    ResampleTransform.transformType   -> ResampleTransform,
    SketchTransform.transformType     -> SketchTransform,
    ScaleTransform.transformType      -> ScaleTransform,
    TopKTransform.transformType       -> TopKTransform,
    ZOrderTransform.transformType     -> ZOrderTransform,
    SortTransform.transformType       -> SortTransform,
    LimitTransform.transformType      -> LimitTransform,
    UnionTransform.transformType      -> UnionTransform,
    DedupTransform.transformType      -> DedupTransform,
    MinhashDedupTransform.transformType -> MinhashDedupTransform,
    MinhashSignaturesTransform.transformType -> MinhashSignaturesTransform,
    SimhashDedupTransform.transformType -> SimhashDedupTransform,
    EmbeddingDedupTransform.transformType -> EmbeddingDedupTransform,
    SemanticDedupTransform.transformType  -> SemanticDedupTransform,
    QuantileFilterTransform.transformType -> QuantileFilterTransform,
    FrequentItemsTransform.transformType  -> FrequentItemsTransform,
    QuantileSketchTransform.transformType -> QuantileSketchTransform,
    graft.dedup.LineDedupTransform.transformType -> graft.dedup.LineDedupTransform,
    graft.dedup.SpanDedupTransform.transformType -> graft.dedup.SpanDedupTransform,
    graft.dedup.GramSignaturesTransform.transformType -> graft.dedup.GramSignaturesTransform,
    DecontaminateTransform.transformType  -> DecontaminateTransform,
    EmbeddingDecontaminateTransform.transformType -> EmbeddingDecontaminateTransform,
    AsofJoinTransform.transformType   -> AsofJoinTransform,
    ProfileTransform.transformType    -> ProfileTransform,
    RangeJoinTransform.transformType  -> RangeJoinTransform,
    TfidfTransform.transformType      -> TfidfTransform,
    MultimodalTransform.transformType -> MultimodalTransform,
    TextSignalsTransform.transformType -> TextSignalsTransform,
    GopherRulesTransform.transformType -> GopherRulesTransform,
    PivotTransform.transformType      -> PivotTransform,
    UnpivotTransform.transformType    -> UnpivotTransform,
    SetOpTransform.transformType      -> SetOpTransform,
    ChunkTransform.transformType      -> ChunkTransform,
    ShardTransform.transformType      -> ShardTransform,
    PackSequencesTransform.transformType -> PackSequencesTransform,
    DriftTransform.transformType      -> DriftTransform,
    ShuffleTransform.transformType    -> ShuffleTransform,
    SampleTransform.transformType     -> SampleTransform,
    MixTransform.transformType        -> MixTransform,
    TokenCapTransform.transformType   -> TokenCapTransform,
    RedactTransform.transformType     -> RedactTransform,
    VocabTopKTransform.transformType  -> VocabTopKTransform,
    NormalizeTextTransform.transformType -> NormalizeTextTransform,
    UrlNormalizeTransform.transformType  -> UrlNormalizeTransform,
    BlocklistTransform.transformType     -> BlocklistTransform,
    AssignIdsTransform.transformType     -> AssignIdsTransform,
    CompressionRatioTransform.transformType -> CompressionRatioTransform,
    ClusterEmbeddingsTransform.transformType -> ClusterEmbeddingsTransform,
    CodebookTransform.transformType   -> CodebookTransform,
    AnnTopKTransform.transformType    -> AnnTopKTransform,
    DedupAgainstTransform.transformType      -> DedupAgainstTransform,
    FuzzyJoinTransform.transformType         -> FuzzyJoinTransform,
    CollocationsTransform.transformType      -> CollocationsTransform,
    ExplodeTransform.transformType           -> ExplodeTransform,
    Scd2Transform.transformType              -> Scd2Transform,
    MergeTransform.transformType             -> MergeTransform,
    FillNaTransform.transformType            -> FillNaTransform,
    EntropyTransform.transformType    -> EntropyTransform,
    ChargramNllTransform.transformType -> ChargramNllTransform,
    ImportanceScoreTransform.transformType -> ImportanceScoreTransform,
    graft.streaming.SessionizeTransform.transformType -> graft.streaming.SessionizeTransform,
    RegisterTransform.transformType   -> RegisterTransform))

  def sinks(): Registry[Sink] = new Registry[Sink]("sink", Map(
    FileSink.sinkType      -> FileSink,
    "s3"                   -> FileSink,
    KafkaSink.sinkType     -> KafkaSink,
    KafkaFileSink.sinkType -> KafkaFileSink,
    "postgres"             -> new JdbcSink("postgres", "postgres"),
    "mysql"                -> new JdbcSink("mysql", "mysql")))
}
