package graft.sources

/** Zstandard (RFC 8878) decode/encode via the `zstd-jni` library that
  * Spark itself bundles for shuffle/parquet compression
  * (`com.github.luben.zstd` on the runtime classpath) — no from-scratch
  * FSE/Huffman needed, and the frames are exactly what `numcodecs.Zstd`
  * and Zarr V3's `zstd` codec write.
  *
  * Every decode states the expected plaintext size up front (the chunk
  * cell count the metadata walk already validated), so a crafted frame
  * can never size an allocation: the output buffer is `expect` bytes
  * and zstd-jni fails loudly when the frame disagrees. JNI errors are
  * re-wrapped as `IllegalArgumentException` with the caller's label so
  * corrupt chunks reject with provenance, the codec-fuzz discipline.
  */
object ZstdCodec {

  /** Decode one zstd frame into exactly `expect` bytes. */
  def decompress(frame: Array[Byte], expect: Int, label: String): Array[Byte] = {
    require(expect >= 0, s"zstd: negative expected size $expect in $label")
    val out = new Array[Byte](expect)
    val n =
      try com.github.luben.zstd.Zstd.decompress(out, frame)
      catch {
        case e: com.github.luben.zstd.ZstdException =>
          throw new IllegalArgumentException(
            s"zstd: corrupt frame in $label — ${e.getMessage}")
      }
    require(n == expect,
      s"zstd: frame decodes to $n bytes, expected $expect in $label")
    out
  }

  /** Encode (writer-fixture side; level 3 = the zarr/numcodecs default). */
  def compress(raw: Array[Byte], level: Int = 3): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(raw, level)
}
