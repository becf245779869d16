package graft.cli

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import graft.codec.{HttpSchemaRegistry, MiniJson}

/** Client config files, matching the reference's `~/.zync/kafka.json` and
  * `~/.zync/schema_registry.json` shapes (cli/flags.go:65-141 and 43-62) —
  * here under `~/.graft/`. The kafka.json fields translate to the
  * `kafka.`-prefixed reader/writer options the Spark Kafka DSv2 connector
  * hands to the Java client:
  *
  *   - `security_protocol` → `kafka.security.protocol` (PLAINTEXT,
  *     SASL_PLAINTEXT, SASL_SSL, SSL — anything else rejected, flags.go:123)
  *   - SASL_* + `sasl_mechanisms: PLAIN` (the only mechanism the reference
  *     accepts, flags.go:128-139) → `kafka.sasl.mechanism` +
  *     `kafka.sasl.jaas.config` with the username/password
  *   - TLS client cert/key and server CA PEM files → inline
  *     `kafka.ssl.keystore.{type,certificate.chain,key}` /
  *     `kafka.ssl.truststore.{type,certificates}` (the Java client's PEM
  *     support; file CONTENTS are inlined so executors never need the paths)
  *   - `tls_server_insecure_skip_verify` → empty
  *     `kafka.ssl.endpoint.identification.algorithm` (hostname verification
  *     off — the Java client's closest knob; it cannot skip chain validation)
  */
final case class KafkaClientConfig(
    bootstrapServers: String,
    securityProtocol: String,
    saslMechanisms: Option[String],
    saslUsername: Option[String],
    saslPassword: Option[String],
    tlsClientCertFile: Option[String],
    tlsClientKeyFile: Option[String],
    tlsServerCaCertFile: Option[String],
    tlsServerInsecureSkipVerify: Boolean) {

  /** The `clientOptions` map for [[graft.streaming.KafkaTopicSource]] /
    * sink — everything except the structural options the source itself sets.
    */
  def clientOptions: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    securityProtocol match {
      case "" | "PLAINTEXT" | "SASL_PLAINTEXT" | "SSL" | "SASL_SSL" =>
        if (securityProtocol.nonEmpty) b += "kafka.security.protocol" -> securityProtocol
      case other =>
        throw new IllegalArgumentException(s"unknown security_protocol value \"$other\"")
    }
    if (securityProtocol == "SSL" || securityProtocol == "SASL_SSL") {
      (tlsClientCertFile, tlsClientKeyFile) match {
        case (Some(cert), Some(key)) =>
          b += "kafka.ssl.keystore.type" -> "PEM"
          b += "kafka.ssl.keystore.certificate.chain" -> readPem(cert, "tls_client_cert_file")
          b += "kafka.ssl.keystore.key" -> readPem(key, "tls_client_key_file")
        case (None, None) => ()
        case _ => throw new IllegalArgumentException(
          "tls_client_cert_file and tls_client_key_file must be set together")
      }
      tlsServerCaCertFile.foreach { ca =>
        b += "kafka.ssl.truststore.type" -> "PEM"
        b += "kafka.ssl.truststore.certificates" -> readPem(ca, "tls_server_ca_cert_file")
      }
      if (tlsServerInsecureSkipVerify)
        b += "kafka.ssl.endpoint.identification.algorithm" -> ""
    }
    if (securityProtocol.startsWith("SASL_")) {
      saslMechanisms.getOrElse("") match {
        case "PLAIN" =>
          b += "kafka.sasl.mechanism" -> "PLAIN"
          // JAAS string values need \" and \\ escaped — an unescaped quote in
          // a password would break the login config (or inject options)
          def jaas(v: String) = v.replace("\\", "\\\\").replace("\"", "\\\"")
          val user = jaas(saslUsername.getOrElse(""))
          val pass = jaas(saslPassword.getOrElse(""))
          b += "kafka.sasl.jaas.config" ->
            ("org.apache.kafka.common.security.plain.PlainLoginModule required " +
              s"""username="$user" password="$pass";""")
        case other =>
          throw new IllegalArgumentException(s"unknown sasl_mechanisms value \"$other\"")
      }
    }
    b.result()
  }

  /** The same options unprefixed, for the raw AdminClient
    * ([[graft.streaming.KafkaTopicAdmin]] takes client config directly).
    */
  def adminOptions: Map[String, String] =
    clientOptions.map { case (k, v) => k.stripPrefix("kafka.") -> v }

  private def readPem(path: String, field: String): String =
    try new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    catch { case e: java.io.IOException =>
      throw new IllegalArgumentException(s"failed to read $field $path: ${e.getMessage}", e)
    }
}

object KafkaClientConfig {
  def defaultPath: Path =
    Paths.get(sys.props("user.home"), ".graft", "kafka.json")

  def parse(json: String): KafkaClientConfig = KafkaClientConfig(
    bootstrapServers = MiniJson.stringField(json, "bootstrap_servers").getOrElse(""),
    securityProtocol = MiniJson.stringField(json, "security_protocol").getOrElse(""),
    saslMechanisms = MiniJson.stringField(json, "sasl_mechanisms"),
    saslUsername = MiniJson.stringField(json, "sasl_username"),
    saslPassword = MiniJson.stringField(json, "sasl_password"),
    tlsClientCertFile = MiniJson.stringField(json, "tls_client_cert_file"),
    tlsClientKeyFile = MiniJson.stringField(json, "tls_client_key_file"),
    tlsServerCaCertFile = MiniJson.stringField(json, "tls_server_ca_cert_file"),
    tlsServerInsecureSkipVerify =
      MiniJson.boolField(json, "tls_server_insecure_skip_verify").getOrElse(false))

  def load(path: Path = defaultPath): KafkaClientConfig =
    parse(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))
}

/** `schema_registry.json`: url + optional basic-auth credentials
  * (cli/flags.go:43-62).
  */
final case class RegistryClientConfig(url: String, user: Option[String],
    password: Option[String]) {
  def registry(): HttpSchemaRegistry =
    new HttpSchemaRegistry(url,
      user.map(u => (u, password.getOrElse(""))))
}

object RegistryClientConfig {
  def defaultPath: Path =
    Paths.get(sys.props("user.home"), ".graft", "schema_registry.json")

  def parse(json: String): RegistryClientConfig = RegistryClientConfig(
    url = MiniJson.stringField(json, "url").getOrElse(
      throw new IllegalArgumentException("schema_registry.json: missing \"url\"")),
    user = MiniJson.stringField(json, "user").filter(_.nonEmpty),
    password = MiniJson.stringField(json, "password").filter(_.nonEmpty))

  def load(path: Path = defaultPath): RegistryClientConfig =
    parse(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))
}
