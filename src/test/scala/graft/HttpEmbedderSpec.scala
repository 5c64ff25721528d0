package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.embed.HttpEmbedder

/** The model-backed embedder seam, exercised against a loopback JDK
  * HttpServer (no network egress) speaking the reference's
  * `embedder_service.py` contract. */
class HttpEmbedderSpec extends AnyFunSuite {

  private def withServer(reply: String)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var lastBody: String = null
    server.createContext("/api/embeddings", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        lastBody = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val bytes = reply.getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/api/embeddings")
    finally server.stop(0)
  }

  test("embed posts the prompt and parses the embedding array") {
    withServer("""{"model":"m","embedding":[0.5, -1.25, 3]}""") { url =>
      val e = HttpEmbedder(url, dim = 5)
      val v = e.padTruncate(e.embed("hello \"world\""))
      assert(v.toSeq == Seq(0.5f, -1.25f, 3f, 0f, 0f)) // padded to dim
    }
  }

  test("truncates when the service returns more than dim values") {
    withServer("""{"embedding":[1,2,3,4]}""") { url =>
      val e = HttpEmbedder(url, dim = 2)
      assert(e.padTruncate(e.embed("x")).toSeq == Seq(1f, 2f))
    }
  }

  test("malformed replies fail loudly") {
    withServer("""{"no_embedding_here":true}""") { url =>
      val e = HttpEmbedder(url, dim = 2)
      intercept[IllegalArgumentException](e.embed("x"))
    }
  }
}
