package graft.server

import java.security.KeyStore
import java.security.cert.{CertificateFactory, X509Certificate}
import java.security.spec.PKCS8EncodedKeySpec

import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** Zero-dependency PEM → [[javax.net.ssl.SSLContext]] loading — the
  * TLS half of the reference's server surface
  * (varpulis-cli/src/main.rs:120-126 `--tls-cert`/`--tls-key`, PEM
  * format, env VARPULIS_TLS_CERT/VARPULIS_TLS_KEY; enables HTTPS on
  * the API listener and WSS on the ws listener).
  *
  * Accepted inputs match what the reference's rustls loader takes in
  * practice: a certificate file with one or more `BEGIN CERTIFICATE`
  * blocks (leaf first, then any chain), and a private key as either
  * PKCS#8 (`BEGIN PRIVATE KEY` — RSA or EC) or the OpenSSL
  * "traditional" PKCS#1 form (`BEGIN RSA PRIVATE KEY`), which is
  * re-wrapped into PKCS#8 by emitting the PrivateKeyInfo DER envelope
  * around the raw key bytes (RFC 5208 §5) — no parsing of the key
  * material itself. Encrypted keys are rejected with a pointed error.
  *
  * Everything comes from the JDK: `CertificateFactory` for X.509,
  * `KeyFactory` for the key, an in-memory PKCS12 `KeyStore` feeding
  * `KeyManagerFactory`, and a TLS `SSLContext` out.
  */
object Tls {

  /** Build a server SSLContext from PEM cert(s) + PEM private key. */
  def sslContext(certPemFile: String, keyPemFile: String): SSLContext = {
    val certs = readCerts(readFile(certPemFile), certPemFile)
    val key = readKey(readFile(keyPemFile), keyPemFile)
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks.setKeyEntry("graft", key, Array.emptyCharArray, certs.toArray)
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Array.emptyCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Client-side context trusting exactly the given PEM cert(s) —
    * what a test client (or a CLI talking to a self-signed server)
    * uses instead of the platform trust store.
    */
  def clientContext(certPemFile: String): SSLContext = {
    val certs = readCerts(readFile(certPemFile), certPemFile)
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    certs.zipWithIndex.foreach { case (c, i) =>
      ks.setCertificateEntry(s"graft-$i", c)
    }
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  private def readFile(path: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")

  /** All CERTIFICATE blocks of a PEM file, leaf first. */
  private def readCerts(pem: String, where: String): Seq[X509Certificate] = {
    val blocks = pemBlocks(pem, "CERTIFICATE")
    require(blocks.nonEmpty, s"no CERTIFICATE block in $where")
    val cf = CertificateFactory.getInstance("X.509")
    blocks.map(der => cf.generateCertificate(
      new java.io.ByteArrayInputStream(der)).asInstanceOf[X509Certificate])
  }

  /** The private key of a PEM file: PKCS#8 directly, PKCS#1 RSA via
    * the RFC 5208 envelope. Tries RSA then EC key factories (the
    * PKCS#8 header names the algorithm but the JDK makes the caller
    * pick the factory).
    */
  private def readKey(pem: String, where: String)
      : java.security.PrivateKey = {
    if (pem.contains("ENCRYPTED PRIVATE KEY"))
      throw new IllegalArgumentException(
        s"$where is an encrypted private key — decrypt it first " +
          "(openssl pkcs8 -topk8 -nocrypt)")
    val pkcs8 = pemBlocks(pem, "PRIVATE KEY") match {
      case Seq(der, _*) => der
      case _ =>
        pemBlocks(pem, "RSA PRIVATE KEY") match {
          case Seq(der, _*) => pkcs1ToPkcs8(der)
          case _ =>
            pemBlocks(pem, "EC PRIVATE KEY") match {
              case Seq(_, _*) => throw new IllegalArgumentException(
                s"$where is a SEC1 EC key — convert to PKCS#8 " +
                  "(openssl pkcs8 -topk8 -nocrypt)")
              case _ => throw new IllegalArgumentException(
                s"no PRIVATE KEY block in $where")
            }
        }
    }
    val spec = new PKCS8EncodedKeySpec(pkcs8)
    Seq("RSA", "EC").view.flatMap { alg =>
      scala.util.Try(
        java.security.KeyFactory.getInstance(alg).generatePrivate(spec))
        .toOption
    }.headOption.getOrElse(throw new IllegalArgumentException(
      s"could not load private key from $where as RSA or EC PKCS#8"))
  }

  /** Base64-decoded bodies of every `-----BEGIN <label>-----` block.
    * Exact label match only — "PRIVATE KEY" does not match
    * "RSA PRIVATE KEY" or "ENCRYPTED PRIVATE KEY".
    */
  private[graft] def pemBlocks(pem: String, label: String)
      : Seq[Array[Byte]] = {
    val begin = s"-----BEGIN $label-----"
    val end = s"-----END $label-----"
    val out = Seq.newBuilder[Array[Byte]]
    var from = 0
    var i = pem.indexOf(begin, from)
    while (i >= 0) {
      val j = pem.indexOf(end, i)
      require(j > i, s"unterminated PEM block '$label'")
      val body = pem.substring(i + begin.length, j)
        .filterNot(c => c.isWhitespace)
      out += java.util.Base64.getDecoder.decode(body)
      from = j + end.length
      i = pem.indexOf(begin, from)
    }
    out.result()
  }

  /** Wrap a PKCS#1 RSAPrivateKey DER blob in the PKCS#8
    * PrivateKeyInfo envelope (RFC 5208 §5):
    * SEQUENCE { INTEGER 0, SEQUENCE { OID rsaEncryption, NULL },
    * OCTET STRING <pkcs1> }. Pure DER emission — the key bytes pass
    * through untouched.
    */
  private[graft] def pkcs1ToPkcs8(pkcs1: Array[Byte]): Array[Byte] = {
    // AlgorithmIdentifier for rsaEncryption 1.2.840.113549.1.1.1 + NULL
    val algId = Array[Byte](0x30, 0x0d,
      0x06, 0x09, 0x2a, 0x86.toByte, 0x48, 0x86.toByte, 0xf7.toByte,
      0x0d, 0x01, 0x01, 0x01,
      0x05, 0x00)
    val version = Array[Byte](0x02, 0x01, 0x00)
    val octet = derTlv(0x04, pkcs1)
    derTlv(0x30, version ++ algId ++ octet)
  }

  /** One DER TLV: tag, definite length (short or long form), value. */
  private def derTlv(tag: Int, value: Array[Byte]): Array[Byte] = {
    val n = value.length
    val header =
      if (n < 0x80) Array[Byte](tag.toByte, n.toByte)
      else {
        val lenBytes = BigInt(n).toByteArray.dropWhile(_ == 0)
        Array[Byte](tag.toByte, (0x80 | lenBytes.length).toByte) ++ lenBytes
      }
    header ++ value
  }
}
