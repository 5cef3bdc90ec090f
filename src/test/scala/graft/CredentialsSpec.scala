package graft

import graft.sources.{CredentialStore, Sources}
import org.scalatest.funsuite.AnyFunSuite

/** Credential persistence: round-trips, obfuscation-not-plaintext,
  * failure-as-empty/None semantics (db_utils.py:13-114 behavior). */
class CredentialsSpec extends AnyFunSuite {

  private def freshStore() = {
    val home = java.nio.file.Files.createTempDirectory("graft_home")
    val cfg = java.nio.file.Files.createTempDirectory("graft_cfg")
    (new CredentialStore(home, cfg), home, cfg)
  }

  private val config = Map(
    "db_type" -> "postgresql", "host" -> "db.internal", "port" -> "5432",
    "user" -> "analyst", "password" -> "s3cret-pw", "database" -> "shop")

  test("personal tier round-trips; password is never plaintext on disk") {
    val (store, home, _) = freshStore()
    assert(!store.credentialsExist())
    assert(store.saveCredentials(config))
    assert(store.credentialsExist())
    val raw = new String(java.nio.file.Files.readAllBytes(
      home.resolve(".asksql_credentials.json")), "UTF-8")
    assert(!raw.contains("s3cret-pw"), "password must be obfuscated")
    assert(store.loadCredentials() == config)
    assert(store.clearSavedCredentials() && !store.credentialsExist())
    assert(store.loadCredentials() == Map.empty, "missing file loads empty")
  }

  test("encrypted tier: round-trip, auto key, tamper and wrong-key load as None") {
    val (store, _, cfg) = freshStore()
    assert(store.loadTestDbCredentials().isEmpty, "nothing stored yet")
    assert(store.saveTestDbCredentials(config))
    assert(java.nio.file.Files.exists(cfg.resolve("test_db.key")), "key auto-created")
    assert(store.loadTestDbCredentials().contains(config))
    val raw = java.nio.file.Files.readAllBytes(cfg.resolve("test_db.enc"))
    assert(!new String(raw, "ISO-8859-1").contains("s3cret-pw"), "blob is ciphertext")
    // tamper one ciphertext byte → GCM tag fails → None, no throw
    raw(raw.length - 1) = (raw(raw.length - 1) ^ 0x01).toByte
    java.nio.file.Files.write(cfg.resolve("test_db.enc"), raw)
    assert(store.loadTestDbCredentials().isEmpty, "tampered blob loads None")
    // restore blob, rotate the key → also None
    assert(store.saveTestDbCredentials(config))
    val badKey = new Array[Byte](32)
    java.nio.file.Files.write(cfg.resolve("test_db.key"), badKey)
    assert(store.loadTestDbCredentials().isEmpty, "wrong key loads None")
  }

  test("loadDbConfig adapts a stored config into the JDBC tier") {
    val (store, _, _) = freshStore()
    store.saveTestDbCredentials(config)
    val db = store.loadDbConfig()
    assert(db.contains(Sources.DbConfig("postgresql", "db.internal", 5432,
      "analyst", "s3cret-pw", "shop")))
    assert(db.get.jdbcUrl == "jdbc:postgresql://db.internal:5432/shop")
    // incomplete configs adapt to None rather than throwing
    val (store2, _, _) = freshStore()
    store2.saveCredentials(Map("host" -> "x"))
    assert(store2.loadDbConfig().isEmpty)
  }
}
