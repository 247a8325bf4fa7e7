package graft.http

import java.io.FileInputStream
import java.security.KeyStore

import javax.net.ssl.{KeyManagerFactory, SSLContext}

/** TLS server credentials: an `SSLContext` over a PKCS12 keystore —
  * the same certificate-file contract the reference exposes through its
  * `pgwire.tls.*` / `http.tls.*` config (`cert.key`/`cert.pem` pairs,
  * see reference server.conf docs). Both network servers
  * ([[PgWireServer]] via the protocol's SSLRequest upgrade,
  * [[RestServer]] as plain HTTPS) take an optional `(keystorePath,
  * password)`; absent means the current cleartext behavior.
  */
object Tls {
  def context(keystorePath: String, password: String): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    val is = new FileInputStream(keystorePath)
    try ks.load(is, password.toCharArray) finally is.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, password.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }
}
