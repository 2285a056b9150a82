package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{CosineSimilarity, VectorFunctions => V}

/**
 * MLlib-backed approximate-nearest-neighbor paths (SURVEY.md §2.3 scale
 * variants; reference vector stores use OpenSearch knn / pgvector ivfflat —
 * these are the in-engine equivalents):
 *
 *  - IVF: KMeans centroids partition the index into `nlist` cells; a query
 *    scans only the `nprobe` cells whose centroids are nearest. The
 *    hand-rolled hash-bucket variant lives in [[Similarity]]; this one
 *    learns real centroids, which is what keeps recall at scale.
 *  - LSH: MLlib BucketedRandomProjectionLSH over L2-normalized vectors
 *    (Euclidean NN on normalized vectors = cosine NN).
 *
 * Both are deterministic given the seed.
 */
object MlAnn {

  private def toVec(embCol: Column): Column =
    array_to_vector(embCol.cast("array<double>"))

  /** Assign every row to a KMeans cell. Returns (assigned frame with
    * `ivf_cell`, centroid arrays indexed by cell id). */
  def kmeansIvf(index: DataFrame, embCol: String, idCol: String,
                nlist: Int, seed: Long = 7L): (DataFrame, Array[Array[Double]]) = {
    val vecs = index.select(col(idCol).as("id"),
      V.toDouble(col(embCol)).as("emb"),
      toVec(col(embCol)).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features")
      .fit(vecs)
    val assigned = model.transform(vecs)
      .select(col("id"), col("emb"), col("prediction").as("ivf_cell"))
    (assigned, model.clusterCenters.map(_.toArray))
  }

  /** IVF probe: scan the `nprobe` cells nearest the query (centroid ranking
    * happens driver-side over the tiny centroid array), cosine top-k inside. */
  def ivfTopK(assigned: DataFrame, centers: Array[Array[Double]],
              query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    CosineSimilarity.register(assigned.sparkSession)
    val q = Vectors.dense(query.toArray)
    val probeCells = centers.zipWithIndex
      .map { case (c, i) => (i, Vectors.sqdist(Vectors.dense(c), q)) }
      .sortBy { case (i, d) => (d, i) }
      .take(nprobe).map(_._1)
    assigned
      .filter(col("ivf_cell").isin(probeCells: _*))
      .select(col("id"),
        CosineSimilarity.cosine(col("emb"), typedLit(query)).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  /** LSH approximate top-k by cosine: normalize, bucket with random
    * hyperplane projections, approxNearestNeighbors by Euclidean distance. */
  def lshTopK(index: DataFrame, embCol: String, idCol: String,
              query: Seq[Double], k: Int,
              bucketLength: Double = 1.0, numHashTables: Int = 3,
              seed: Long = 7L): DataFrame = {
    val norm = udfFreeNormalize(index, embCol, idCol)
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(seed).setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(norm)
    val qn = {
      val n = math.sqrt(query.map(x => x * x).sum)
      Vectors.dense(query.map(x => if (n == 0) 0.0 else x / n).toArray)
    }
    model.approxNearestNeighbors(norm, qn, k).toDF()
      .select(col("id"), (lit(1.0) - col("distCol") * col("distCol") / 2.0)
        .as("score")) // ||a-b||² = 2 - 2cos on unit vectors
      .orderBy(desc("score"), col("id"))
  }

  /** L2-normalize the embedding column into an MLlib vector — pure Column
    * math, no UDF. */
  private def udfFreeNormalize(index: DataFrame, embCol: String,
                               idCol: String): DataFrame = {
    val emb = V.toDouble(col(embCol))
    val n = sqrt(aggregate(emb, lit(0.0), (acc, x) => acc + x * x))
    index.select(col(idCol).as("id"),
      toVec(transform(emb, x => when(n === 0.0, 0.0).otherwise(x / n)))
        .as("features"))
  }
}
