"""Round-4 additions — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace
from .q_text import _NORM  # noqa: F401 — cross-domain helper
from .q_streaming import _stream_seq  # noqa: F401 — shared drain counter



def _streaming_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ozone_spark.streaming import windows as swin
    import tempfile

    _stream_seq[0] += 1
    name = f"gate_attrib_{_stream_seq[0]}"
    stream = swin.read_events_stream(spark, f"{sf_dir}/events.parquet")
    return swin.drain_to_memory(
        swin.streaming_attribution(stream), spark, name,
        tempfile.mkdtemp(prefix="ozs_ckpt_"), output_mode="append")


_RDS_N = pipeline.SPAN_REMOVE_NGRAM

# Round-4 additions (registered BEHIND the round-3 gate backlog: this
# list is last in _REGISTRY_ORDER, so never-verified round-3 queries
# keep their place at the head of the driver's capped gate).
R4_QUERIES: list[QuerySpec] = [
    _q(
        "remove_duplicate_spans",
        lambda spark, sf: pipeline.remove_duplicate_spans(
            views(spark, sf)["documents"]),
        # keep-first span deletion replayed positionally: same 60-bit
        # md5 span hash (wide enough that no birthday collision can
        # falsely delete text), same 1-based starts, cleaned text
        # re-joined with ORDER BY pos and fingerprinted
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
), spans AS (
  SELECT doc_id, pos AS start,
    CAST(('0x' || substr(md5(array_to_string(w[pos:pos+{_RDS_N - 1}], ' ')),
          1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, w,
          unnest(range(1, greatest(len(w) - {_RDS_N - 1}, 0) + 1)) AS pos
        FROM words)
), stats AS (
  SELECT h, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS keeper
  FROM spans GROUP BY 1
), covered AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT s.doc_id, unnest(range(s.start, s.start + {_RDS_N})) AS pos
    FROM spans s JOIN stats t USING (h)
    WHERE t.n_docs >= 2 AND s.doc_id > t.keeper)
), toks AS (
  SELECT doc_id, pos, w[CAST(pos AS INT)] AS tok
  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS pos FROM words)
), flagged AS (
  SELECT t.doc_id, t.pos, t.tok, c.pos IS NOT NULL AS cov
  FROM toks t LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.pos = t.pos
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(CASE WHEN cov THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
  round(sum(CASE WHEN cov THEN 1 ELSE 0 END) / count(*), 6) AS frac_removed,
  md5(coalesce(string_agg(CASE WHEN NOT cov THEN tok END, ' ' ORDER BY pos),
      '')) AS cleaned_fp
FROM flagged GROUP BY doc_id ORDER BY doc_id""",
        bench=True,
    ),
    _q(
        "payload_chunk_near_dup",
        lambda spark, sf: multimodal.payload_chunk_near_dup(
            multimodal.as_media_table(views(spark, sf)["documents"])),
        # rolling-hash cut rule replayed with lag() windows; chunk md5s
        # via substr on the ASCII fixture (byte == char positions)
        f"""WITH pos AS (
  SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
  FROM documents
), bytes AS (
  SELECT doc_id, i - 1 AS p, unicode(substr(text, i, 1)) AS b FROM pos
), hh AS (
  SELECT doc_id, p, b,
    lag(b, 1) OVER w AS b1, lag(b, 2) OVER w AS b2, lag(b, 3) OVER w AS b3
  FROM bytes WINDOW w AS (PARTITION BY doc_id ORDER BY p)
), flags AS (
  SELECT doc_id, p,
    CASE WHEN p >= 3 AND (b + 9*b1 + 81*b2 + 729*b3)
             % {multimodal.CHUNK_MOD} = 0
         THEN 1 ELSE 0 END AS cut
  FROM hh
), cid AS (
  SELECT doc_id, p,
    coalesce(sum(cut) OVER (PARTITION BY doc_id ORDER BY p
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
  FROM flags
), spans AS (
  SELECT doc_id, chunk_id, min(p) AS lo, count(*) AS clen
  FROM cid GROUP BY 1, 2
), ch AS (
  SELECT DISTINCT s.doc_id,
    md5(substr(d.text, CAST(s.lo + 1 AS INT), CAST(s.clen AS INT))) AS cm
  FROM spans s JOIN documents d USING (doc_id)
), sizes AS (
  SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY 1
), cold AS (
  SELECT cm FROM ch GROUP BY cm
  HAVING count(*) <= {multimodal.CHUNK_MAX_BUCKET}
), probe AS (
  SELECT ch.* FROM ch JOIN cold USING (cm)
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM probe a JOIN probe b ON a.cm = b.cm AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
  round(n_common / (sa.n_chunks + sb.n_chunks - n_common), 6) AS jaccard
FROM common JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_chunks + sb.n_chunks - n_common)
      >= {multimodal.CHUNK_JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b""",
        bench=True,
    ),
    _q(
        "perplexity_buckets",
        lambda spark, sf: mining.perplexity_buckets(
            views(spark, sf)["documents"]),
        # lm_cross_entropy's model replay + a per-lang ntile(3) ordered
        # by (COARSE 3-decimal rounded cross-entropy, doc_id) — the
        # coarse grid makes a cross-engine float-boundary flip ~1000x
        # less likely than ordering on the displayed 6-decimal score
        """WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
), big AS (
  SELECT doc_id, w[i] AS prev, w[i + 1] AS cur
  FROM (SELECT doc_id, w,
          unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS i
        FROM words)
), dbc AS (
  SELECT doc_id, prev, cur, count(*) AS n FROM big GROUP BY 1, 2, 3
), c2 AS (
  SELECT prev, cur, sum(n) AS c2 FROM dbc GROUP BY 1, 2
), c1 AS (
  SELECT prev, sum(c2) AS c1 FROM c2 GROUP BY 1
), v AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(w) AS tok FROM words)
), scored AS (
  SELECT doc_id,
    round(-sum(n * log2((c2 + 1.0) / (c1 + v))) / sum(n), 6)
      AS cross_entropy_bits,
    round(power(2.0, -sum(n * log2((c2 + 1.0) / (c1 + v))) / sum(n)), 4)
      AS perplexity
  FROM dbc JOIN c2 USING (prev, cur) JOIN c1 USING (prev) CROSS JOIN v
  GROUP BY doc_id
), tiled AS (
  SELECT s.doc_id, d.lang, s.cross_entropy_bits, s.perplexity,
    ntile(3) OVER (PARTITION BY d.lang
                   ORDER BY round(s.cross_entropy_bits, 3), s.doc_id) AS t
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT doc_id, lang, cross_entropy_bits, perplexity,
  CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM tiled ORDER BY doc_id""",
    ),
    _q(
        "streaming_attribution",
        _streaming_attribution,
        # inner stream-stream interval join == batch inequality join
        """SELECT v.user_id, v.event_id AS view_event_id,
  c.event_id AS click_event_id,
  (epoch_us(c.ts) - epoch_us(v.ts)) AS gap_us
FROM events v JOIN events c
  ON c.user_id = v.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
ORDER BY 1, 2, 3""",
    ),
]
