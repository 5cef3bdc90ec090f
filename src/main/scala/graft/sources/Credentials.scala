package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.security.SecureRandom
import java.util.Base64
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/** Connection-credential persistence, behavior-parity with the reference's
  * db_utils.py:13-114 two-tier scheme:
  *
  *   - PERSONAL credentials: one JSON file in the user's home directory
  *     with the password base64-OBFUSCATED (the reference is explicit that
  *     this is "NOT encryption, just prevents plain text" — reproduced,
  *     and documented identically). Load failure → empty config; clear
  *     deletes the file.
  *   - SHARED/TEST credentials: an encrypted blob + an auto-generated key
  *     file under `.config/` (db_utils.py:39-73). The reference uses
  *     Fernet (AES-CBC + HMAC); the JDK-native equivalent here is
  *     AES-256-GCM — same contract: the key file is created on first use,
  *     any decrypt failure (missing file, wrong key, tampered bytes)
  *     loads as None, never throws.
  *
  * Paths are injectable so tests never touch a real home directory. The
  * stored config shape matches `Sources.DbConfig` (app.py's sidebar
  * form), and `loadDbConfig` adapts straight into the JDBC source tier.
  */
final class CredentialStore(homeDir: Path, configDir: Path) {

  def this() = this(Paths.get(System.getProperty("user.home")),
    Paths.get(".config"))

  private val credsFile = homeDir.resolve(".asksql_credentials.json")
  private val encFile = configDir.resolve("test_db.enc")
  private val keyFile = configDir.resolve("test_db.key")
  private val mapper = new ObjectMapper()

  // ---- personal tier (base64-obfuscated JSON, db_utils.py:76-114) ----

  def credentialsExist(): Boolean = Files.exists(credsFile)

  /** Save with the password base64-encoded — obfuscation only, mirroring
    * the reference's documented choice. Returns false on IO failure. */
  def saveCredentials(config: Map[String, String]): Boolean =
    try {
      val copy = config.get("password").filter(_.nonEmpty) match {
        case Some(p) => config.updated("password",
          Base64.getEncoder.encodeToString(p.getBytes(UTF_8)))
        case None => config
      }
      Files.createDirectories(credsFile.getParent)
      Files.write(credsFile, toJson(copy).getBytes(UTF_8))
      true
    } catch { case _: Exception => false }

  /** Load and de-obfuscate; any failure yields an EMPTY config (the
    * reference returns {} rather than erroring, db_utils.py:105-107). */
  def loadCredentials(): Map[String, String] =
    try {
      if (!Files.exists(credsFile)) Map.empty
      else {
        val config = fromJson(new String(Files.readAllBytes(credsFile), UTF_8))
        config.get("password").filter(_.nonEmpty) match {
          case Some(p) => config.updated("password",
            new String(Base64.getDecoder.decode(p), UTF_8))
          case None => config
        }
      }
    } catch { case _: Exception => Map.empty }

  def clearSavedCredentials(): Boolean =
    try { Files.deleteIfExists(credsFile); true }
    catch { case _: Exception => false }

  // ---- shared tier (encrypted blob + auto key, db_utils.py:25-73) ----

  private def getOrCreateKey(): Array[Byte] = {
    if (Files.exists(keyFile)) Files.readAllBytes(keyFile)
    else {
      val key = new Array[Byte](32)
      new SecureRandom().nextBytes(key)
      Files.createDirectories(configDir)
      Files.write(keyFile, key)
      key
    }
  }

  /** AES-256-GCM encrypt the config JSON under the auto-managed key.
    * Blob layout: 12-byte random nonce ++ ciphertext+tag. */
  def saveTestDbCredentials(config: Map[String, String]): Boolean =
    try {
      val key = getOrCreateKey()
      val nonce = new Array[Byte](12)
      new SecureRandom().nextBytes(nonce)
      val cipher = Cipher.getInstance("AES/GCM/NoPadding")
      cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
        new GCMParameterSpec(128, nonce))
      val ct = cipher.doFinal(toJson(config).getBytes(UTF_8))
      Files.createDirectories(configDir)
      Files.write(encFile, nonce ++ ct)
      true
    } catch { case _: Exception => false }

  /** Decrypt-or-None: missing blob, missing/rotated key, or a tampered
    * byte (GCM tag mismatch) all load as None, matching the reference's
    * swallow-and-None (db_utils.py:56-73). */
  def loadTestDbCredentials(): Option[Map[String, String]] =
    try {
      if (!Files.exists(encFile) || !Files.exists(keyFile)) None
      else {
        val blob = Files.readAllBytes(encFile)
        val cipher = Cipher.getInstance("AES/GCM/NoPadding")
        cipher.init(Cipher.DECRYPT_MODE,
          new SecretKeySpec(Files.readAllBytes(keyFile), "AES"),
          new GCMParameterSpec(128, blob.take(12)))
        Some(fromJson(new String(cipher.doFinal(blob.drop(12)), UTF_8)))
      }
    } catch { case _: Exception => None }

  /** Adapter into the JDBC tier: a stored config (either tier) becomes a
    * `Sources.DbConfig` when it carries the full connection shape. */
  def loadDbConfig(): Option[Sources.DbConfig] = {
    val m = loadTestDbCredentials().getOrElse(loadCredentials())
    for {
      t <- m.get("db_type"); h <- m.get("host"); p <- m.get("port")
      u <- m.get("user"); pw <- m.get("password"); d <- m.get("database")
      port <- p.toIntOption
    } yield Sources.DbConfig(t, h, port, u, pw, d)
  }

  private def toJson(m: Map[String, String]): String = {
    val node = mapper.createObjectNode()
    m.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    mapper.writeValueAsString(node)
  }

  private def fromJson(s: String): Map[String, String] = {
    val node = mapper.readTree(s)
    val it = node.fieldNames()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val k = it.next(); b += k -> node.get(k).asText() }
    b.result()
  }
}
