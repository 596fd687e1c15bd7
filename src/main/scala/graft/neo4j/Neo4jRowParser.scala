package graft.neo4j

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import java.io.InputStream
import scala.collection.mutable.ArrayBuffer

/** Streaming parser for Neo4j transactional-endpoint responses:
  * walks the JSON stream, pulls every `"row"` array, and maps JSON
  * scalars to JVM values with the same type mapping as the
  * reference's Neo4jInputFormat.readFields
  * (Neo4jInputFormat.java:96-140): null / boolean / int / long /
  * double / text; anything else is an error.
  *
  * Streaming (jackson) rather than tree-parsing the whole body keeps
  * memory O(row) no matter how large the result — the same property
  * the reference gets from `X-Stream: true`.
  */
object Neo4jRowParser {

  val RowField = "row"

  /** Parses all `"row"` entries from a transactional response body. */
  def parseRows(in: InputStream): Iterator[Array[Any]] = {
    val parser = new JsonFactory().createParser(in)
    new Iterator[Array[Any]] {
      private var nextRow: Array[Any] = advance()

      private def advance(): Array[Any] = {
        while (parser.nextToken() != null) {
          if (parser.currentToken() == JsonToken.FIELD_NAME &&
              parser.currentName() == RowField) {
            // move onto the array start, then read scalars until array end
            require(parser.nextToken() == JsonToken.START_ARRAY,
              s""""$RowField" field must hold an array""")
            val buf = new ArrayBuffer[Any]()
            var tok = parser.nextToken()
            while (tok != JsonToken.END_ARRAY) {
              // nested arrays/objects are unsupported cell types and must
              // fail loudly — silently skipping them would shrink the row
              // and shift every later column against the schema
              // (reference throws the same way, Neo4jInputFormat.java:137)
              buf += scalar(tok)
              tok = parser.nextToken()
            }
            return buf.toArray
          }
        }
        null
      }

      private def scalar(tok: JsonToken): Any = tok match {
        case JsonToken.VALUE_NULL   => null
        case JsonToken.VALUE_TRUE   => true
        case JsonToken.VALUE_FALSE  => false
        case JsonToken.VALUE_NUMBER_INT =>
          val l = parser.getLongValue
          if (l >= Int.MinValue && l <= Int.MaxValue) l.toInt else l
        case JsonToken.VALUE_NUMBER_FLOAT => parser.getDoubleValue
        case JsonToken.VALUE_STRING       => parser.getText
        case other =>
          throw new IllegalArgumentException(
            s"Unsupported field type for value: $other")
      }

      override def hasNext: Boolean = nextRow != null
      override def next(): Array[Any] = {
        val r = nextRow
        nextRow = advance()
        r
      }
    }
  }
}
