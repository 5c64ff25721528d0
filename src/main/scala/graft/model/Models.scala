package graft.model

import java.sql.Timestamp

/** Typed core (SURVEY §1): case classes for the engine's row shapes.
  * `Dataset[T]` views give compile-time field checks on pipeline code;
  * the untyped `DataFrame` surface stays primary for dynamic queries.
  * Schemas mirror the driver-generated parquet exactly (TESTDATA.md).
  */
case class Region(r_regionkey: Int, r_name: String)
case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
    c_acctbal: Double, c_mktsegment: String)
case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
    s_acctbal: Double)
case class Part(p_partkey: Long, p_name: String, p_brand: String,
    p_type: String, p_size: Int, p_retailprice: Double)
case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)
case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
    l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
    l_discount: Double, l_tax: Double, l_returnflag: String,
    l_linestatus: String, l_shipdate: Timestamp)
case class Doc(doc_id: Long, text: String, lang: String, source: String,
    n_chars: Long)
case class EmbeddingRow(vec_id: Long, embedding: Seq[Float], label: Int)
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Pipeline intermediate shapes (D1–D7 of SURVEY §1.1). */
case class Block(doc_id: String, seq: Long, kind: String, style: String,
    text: String)
case class Section(doc_id: String, sec_id: Long, title: String, text: String,
    n_paragraphs: Long)
case class Chunk(doc_id: String, sec_id: Long, title: String, chunk_idx: Int,
    chunk_text: String)
case class IndexRow(id: String, embedding: Seq[Double], text: String,
    paragraph_name: String, document_name: String, document_version: String)
case class Hit(id: String, score: Double)
