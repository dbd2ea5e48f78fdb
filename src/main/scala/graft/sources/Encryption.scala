package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.crypto.{
  ColumnEncryptionProperties, DecryptionKeyRetriever, DecryptionPropertiesFactory,
  EncryptionPropertiesFactory, FileDecryptionProperties, FileEncryptionProperties}
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.ColumnPath

/** Parquet Modular Encryption support (SURVEY §2A encryption row;
  * reference README.md:37-50 documents the corpus keys — no reading code
  * exists in the reference, so this is data-driven capability).
  *
  * Usage: set `parquet.crypto.factory.class` to
  * [[CorpusCryptoFactory]]'s class name in the Hadoop conf of the
  * session and read/write normally; the factory resolves the published
  * corpus keys (`kf`, `kc1`, `kc2`) and applies AAD prefix "tester" when
  * the file name demands it.
  */
object Encryption {
  // The reference README renders keys as byte lists {0,1,2,…}; the files
  // are actually encrypted with the corresponding ASCII-digit strings
  // (verified empirically: GCM tags only check out with these).
  val FooterKey: Array[Byte] = "0123456789012345".getBytes(UTF_8)
  val ColKey1: Array[Byte] = "1234567890123450".getBytes(UTF_8)
  val ColKey2: Array[Byte] = "1234567890123451".getBytes(UTF_8)
  val AadPrefix: Array[Byte] = "tester".getBytes(UTF_8)

  class CorpusKeyRetriever extends DecryptionKeyRetriever {
    override def getKey(keyMetaData: Array[Byte]): Array[Byte] =
      new String(keyMetaData, UTF_8) match {
        case "kf"  => FooterKey
        case "kc1" => ColKey1
        case "kc2" => ColKey2
        case other => throw new IllegalArgumentException(s"unknown key id $other")
      }
  }

  def decryptionProps(fileName: String): FileDecryptionProperties = {
    val b = FileDecryptionProperties.builder()
      .withKeyRetriever(new CorpusKeyRetriever)
      .withPlaintextFilesAllowed()
    // files that don't store their AAD prefix need it supplied
    if (fileName.contains("disable_aad_storage")) b.withAADPrefix(AadPrefix)
    b.build()
  }
}

/** Read-side factory: resolves corpus keys for any `.encrypted` file. */
class CorpusCryptoFactory extends DecryptionPropertiesFactory with EncryptionPropertiesFactory {
  override def getFileDecryptionProperties(
      conf: Configuration, filePath: Path): FileDecryptionProperties =
    Encryption.decryptionProps(filePath.getName)

  /** Write side: encrypt footer with kf and columns `double_field` /
    * `float_field` with kc1/kc2 — mirroring the corpus layout. */
  override def getFileEncryptionProperties(
      conf: Configuration, tempFilePath: Path,
      fileWriteContext: WriteSupport.WriteContext): FileEncryptionProperties = {
    val c1 = ColumnEncryptionProperties.builder(ColumnPath.get("double_field"))
      .withKey(Encryption.ColKey1).withKeyID("kc1").build()
    val c2 = ColumnEncryptionProperties.builder(ColumnPath.get("float_field"))
      .withKey(Encryption.ColKey2).withKeyID("kc2").build()
    val cols = new java.util.HashMap[ColumnPath, ColumnEncryptionProperties]()
    cols.put(c1.getPath, c1)
    cols.put(c2.getPath, c2)
    FileEncryptionProperties.builder(Encryption.FooterKey)
      .withFooterKeyID("kf")
      .withEncryptedColumns(cols)
      .build()
  }
}
