package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.AwsSigV4

/** Loopback Kinesis FIXTURE: the x-amz-json-1.1 operations the
  * product client calls (PutRecords / ListShards / GetShardIterator
  * / GetRecords), with REAL SigV4 verification — the server
  * recomputes the signature from the received canonical request with
  * its copy of the secret and 403s mismatches, so passing tests
  * prove the product implements the published signing algorithm, not
  * that it echoed a header. Records hash-partition across two shards
  * by partition key (md5, like the real service). Test scope only.
  */
final class MiniKinesis(accessKey: String, secretKey: String,
    region: String = "us-east-1") {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)
  /** Serve ONE malformed (invalid-Base64) GetRecords response — the
    * non-IO decode fault MalformedFrameSpec drives through the
    * poller.
    */
  @volatile var corruptNextGetRecords = false

  // stream -> shard -> records (decoded payloads, in arrival order)
  val shards = Seq("shardId-000000000000", "shardId-000000000001")
  private val data = new ConcurrentHashMap[String, java.util.List[String]]()
  @volatile var badSignatures = 0

  private def shardOf(pk: String): String = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(pk.getBytes(UTF_8))
    shards((md5(0) & 0x7f) % shards.length)
  }

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    x.sendResponseHeaders(code, b.length.toLong)
    val os = x.getResponseBody
    try os.write(b) finally os.close()
  }

  private def verify(x: HttpExchange, body: String): Boolean = {
    val auth = Option(x.getRequestHeaders.getFirst("Authorization")).getOrElse("")
    val date = Option(x.getRequestHeaders.getFirst("X-Amz-Date")).getOrElse("")
    val target = Option(x.getRequestHeaders.getFirst("X-Amz-Target")).getOrElse("")
    val host = Option(x.getRequestHeaders.getFirst("Host")).getOrElse("")
    val expected = AwsSigV4.authorization("POST", "/", "",
      Seq("content-type" -> "application/x-amz-json-1.1", "host" -> host,
        "x-amz-date" -> date, "x-amz-target" -> target),
      body, accessKey, secretKey, region, "kinesis", date)
    val ok = auth == expected
    if (!ok) badSignatures += 1
    ok
  }

  server.createContext("/", (x: HttpExchange) => {
    val body = new String(x.getRequestBody.readAllBytes(), UTF_8)
    if (!verify(x, body))
      respond(x, 403, """{"__type":"InvalidSignatureException"}""")
    else {
      val target = Option(x.getRequestHeaders.getFirst("X-Amz-Target"))
        .getOrElse("").stripPrefix("Kinesis_20131202.")
      target match {
        case "PutRecords" =>
          val recs = """\{"Data":"([^"]+)","PartitionKey":"([^"]+)"\}""".r
            .findAllMatchIn(body).toSeq
          recs.foreach { m =>
            val payload = new String(
              java.util.Base64.getDecoder.decode(m.group(1)), UTF_8)
            data.computeIfAbsent(shardOf(m.group(2)),
              _ => new java.util.concurrent.CopyOnWriteArrayList[String]())
              .add(payload)
          }
          respond(x, 200,
            s"""{"FailedRecordCount":0,"Records":[${recs.map(_ =>
              """{"SequenceNumber":"1"}""").mkString(",")}]}""")
        case "ListShards" =>
          respond(x, 200, s"""{"Shards":[${shards.map(s =>
            s"""{"ShardId":"$s"}""").mkString(",")}]}""")
        case "GetShardIterator" =>
          val shard = """"ShardId"\s*:\s*"([^"]+)"""".r
            .findFirstMatchIn(body).map(_.group(1)).getOrElse("?")
          val itType = """"ShardIteratorType"\s*:\s*"([^"]+)"""".r
            .findFirstMatchIn(body).map(_.group(1)).getOrElse("LATEST")
          val startSeq = """"StartingSequenceNumber"\s*:\s*"([^"]+)"""".r
            .findFirstMatchIn(body).map(_.group(1))
          // iterator token encodes shard + offset; TRIM_HORIZON reads
          // from 0, LATEST from the current end, AT/AFTER_SEQUENCE_
          // NUMBER from the given position (seq numbers here ARE the
          // absolute offsets, like the real service's ordering)
          val off = itType match {
            case "TRIM_HORIZON"          => 0
            case "AT_SEQUENCE_NUMBER"    => startSeq.map(_.toInt).getOrElse(0)
            case "AFTER_SEQUENCE_NUMBER" => startSeq.map(_.toInt + 1).getOrElse(0)
            case _ => Option(data.get(shard)).map(_.size).getOrElse(0)
          }
          respond(x, 200, s"""{"ShardIterator":"$shard:$off"}""")
        case "GetRecords" =>
          val it = """"ShardIterator"\s*:\s*"([^"]+)"""".r
            .findFirstMatchIn(body).map(_.group(1)).getOrElse("?:0")
          val limit = """"Limit"\s*:\s*(\d+)""".r
            .findFirstMatchIn(body).map(_.group(1).toInt).getOrElse(100)
          val Array(shard, offStr) = it.split(":")
          val off = offStr.toInt
          val all = Option(data.get(shard)).map { l =>
            val b = Seq.newBuilder[String]; l.forEach(b += _); b.result()
          }.getOrElse(Nil)
          val out = all.slice(off, off + limit)
          if (corruptNextGetRecords && out.nonEmpty) {
            // malformed payload: invalid Base64 crashes the client's
            // decode with a NON-IO exception (MalformedFrameSpec)
            corruptNextGetRecords = false
            respond(x, 200,
              """{"Records":[{"Data":"!!!not-base64!!!","PartitionKey":"x"}],""" +
                s""""NextShardIterator":"$shard:$off"}""")
          } else {
            val b64 = out.zipWithIndex.map { case (r, i) =>
              s"""{"Data":"${java.util.Base64.getEncoder
                .encodeToString(r.getBytes(UTF_8))}","PartitionKey":"x",""" +
                s""""SequenceNumber":"${off + i}"}"""
            }
            respond(x, 200, s"""{"Records":[${b64.mkString(",")}],""" +
              s""""NextShardIterator":"$shard:${off + out.length}"}""")
          }
        case other =>
          respond(x, 400, s"""{"__type":"UnknownOperationException $other"}""")
      }
    }
  })
  server.start()
}
