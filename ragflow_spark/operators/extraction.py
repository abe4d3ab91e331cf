"""Graph-extraction front door — the deterministic half of the
reference's LLM entity/relation extraction
(graphrag/general/graph_extractor.py:100-150,
graphrag/general/extractor.py:63-88,145-190, graphrag/utils.py:233-296).

The reference prompts an LLM per chunk and receives delimiter-framed
records; EVERYTHING after the response string is rule-code and is what
ships here, all JVM-side:

- record framing (graph_extractor.py:136-146): split the response on
  the record delimiter ``##`` AND the completion delimiter
  ``<|COMPLETE|>`` (split_string_by_multi_markers, utils.py:286-291 —
  strip each piece, drop empties), then keep only the greedy
  ``\\((.*)\\)`` parenthesis body of each record (re.search semantics:
  first ``(`` to the LAST ``)`` on the same line — Java and Python
  regex agree since ``.`` crosses no newlines in either).
- attribute split (extractor.py:66-68): the same multi-marker split on
  the tuple delimiter ``<|>``.
- entity records (utils.py:233-252 handle_single_entity_extraction):
  >= 4 attributes, attr0 == '"entity"' verbatim (quotes intact — the
  clean only happens after the check), name/type cleaned through
  clean_str(x.upper()) (the shared ``clean_entity_name`` JVM
  expression), empty-name drop, and the extractor's entity-type gate
  (extractor.py:63-76: cleaned type lowercased must be in the
  configured list; a gated-out entity record does NOT fall back to the
  relationship branch — attr0 differs).
- relationship records (utils.py:254-276): >= 5 attributes, attr0 ==
  '"relationship"', endpoints cleaned+uppercased then canonically
  sorted, weight = float(last attr) when it matches the reference's
  ``is_float_regex`` ``^[-+]?[0-9]*\\.?[0-9]+$`` else 1.0.
- mention merges (extractor.py:145-190 _merge_nodes/_merge_edges):
  entity type by frequency vote — the reference sorts a Counter by
  count with Python's stable sort, so ties keep first-insertion order;
  that IS first-seen mention order and is made explicit here as
  (count desc, first-seen seq asc).  Descriptions are
  ``<SEP>``-joined **sorted sets** (unlike the seq-ordered
  graph_merge in operators/graph.py — the reference uses both).
  Source ids / keywords pass through ``flat_uniq_list``
  (utils.py:543-552) = ``list(set(flattened))`` — CPython set order,
  nondeterministic; sorted here, the same determinization the resume
  and resolution operators document.  The >12-part LLM summary is the
  model seam; its deterministic ``truncate(desc, 512)`` prefix is
  applied via resolution.truncate_descriptions.

``merge_tuples``/``is_continuous_subsequence`` (utils.py:480-521) are
dead code in the reference (no call sites) and are deliberately not
re-expressed.

Scale shape: parsing is pure map-side JVM string work (split /
regexp_extract / filters — no Python in the hot path); the merges
shuffle on entity names / canonical pairs carrying (name, short
string) rows; the type vote is one extra aggregation plus a window
over the per-(name, type) counts, never the mention rows.
"""
from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window, functions as F

from .graph import GRAPH_FIELD_SEP, _UNESCAPES, clean_entity_name

DEFAULT_ENTITY_TYPES = ["organization", "person", "geo", "event",
                        "category"]
DEFAULT_TUPLE_DELIMITER = "<|>"
DEFAULT_RECORD_DELIMITER = "##"
DEFAULT_COMPLETION_DELIMITER = "<|COMPLETE|>"

_FLOAT_RE = r"^[-+]?[0-9]*\.?[0-9]+$"


def clean_description(col):
    """clean_str without the upper (utils.py:70-78): trim, unescape,
    drop double quotes and control chars."""
    c = F.trim(col)
    for src, dst in _UNESCAPES:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return F.regexp_replace(c, r"[\"\x00-\x1f\x7f-\x9f]", "")


def parse_extraction_records(
        responses: DataFrame,
        chunk_key_col: str = "chunk_key",
        response_col: str = "response",
        seq_col: str = "seq",
        entity_types: list[str] | None = None,
        tuple_delimiter: str = DEFAULT_TUPLE_DELIMITER,
        record_delimiter: str = DEFAULT_RECORD_DELIMITER,
        completion_delimiter: str = DEFAULT_COMPLETION_DELIMITER,
) -> tuple[DataFrame, DataFrame]:
    """(entity_mentions, relation_mentions) from a table of extraction
    responses — the rule-code tail of Extractor.__call__.  ``seq_col``
    orders mentions across chunks (the reference's chunk iteration
    order), feeding the type vote's first-seen tie-break."""
    ent_types = [t.lower() for t in
                 (entity_types or DEFAULT_ENTITY_TYPES)]
    splitter = "|".join(re.escape(m) for m in
                        [record_delimiter, completion_delimiter])
    rec = responses.select(
        F.col(chunk_key_col).alias("chunk_key"),
        F.col(seq_col).alias("seq"),
        F.posexplode(F.split(F.col(response_col), splitter, -1))
        .alias("rec_pos", "_raw"))
    rec = (
        rec.withColumn("_rec", F.trim("_raw"))
        .where(F.col("_rec") != "")
        .withColumn("_body", F.regexp_extract("_rec", r"\((.*)\)", 1))
        .where(F.col("_body") != "")
        .withColumn(
            "_attrs",
            F.filter(
                F.transform(F.split("_body",
                                    re.escape(tuple_delimiter), -1),
                            lambda s: F.trim(s)),
                lambda s: s != ""))
        .withColumn("_n", F.size("_attrs"))
    )

    # try_element_at: Catalyst freely reorders conjunctive predicates,
    # so the size guard does not protect a plain element_at from
    # empty-attr rows (parenless/blank records) — NULL compares false
    ents = (
        rec.where((F.col("_n") >= 4)
                  & (F.try_element_at("_attrs", F.lit(1)) == '"entity"'))
        .select(
            clean_entity_name(F.try_element_at("_attrs", F.lit(2)))
            .alias("entity_name"),
            clean_entity_name(F.try_element_at("_attrs", F.lit(3)))
            .alias("entity_type"),
            clean_description(F.try_element_at("_attrs", F.lit(4)))
            .alias("description"),
            F.col("chunk_key").alias("source_id"),
            "seq", "rec_pos")
        .where(F.trim("entity_name") != "")
        .where(F.lower("entity_type").isin(ent_types))
    )

    w = F.try_element_at("_attrs", F.lit(-1))
    rels = (
        rec.where((F.col("_n") >= 5)
                  & (F.try_element_at("_attrs", F.lit(1)) == '"relationship"'))
        .withColumn("_s", clean_entity_name(F.try_element_at("_attrs", F.lit(2))))
        .withColumn("_t", clean_entity_name(F.try_element_at("_attrs", F.lit(3))))
        .select(
            F.least("_s", "_t").alias("src_id"),
            F.greatest("_s", "_t").alias("tgt_id"),
            clean_description(F.try_element_at("_attrs", F.lit(4)))
            .alias("description"),
            clean_description(F.try_element_at("_attrs", F.lit(5)))
            .alias("keywords"),
            F.when(w.rlike(_FLOAT_RE), w.cast("double"))
            .otherwise(F.lit(1.0)).alias("weight"),
            F.col("chunk_key").alias("source_id"),
            "seq", "rec_pos")
    )
    return ents, rels


def merge_entity_mentions(ents: DataFrame) -> DataFrame:
    """_merge_nodes (extractor.py:145-166): per entity — type by
    (count desc, first-seen asc) vote, sorted-set <SEP> description,
    united source ids, mention count."""
    votes = (
        ents.groupBy("entity_name", "entity_type")
        .agg(F.count("*").alias("c"),
             F.min(F.struct("seq", "rec_pos")).alias("first"))
    )
    win = Window.partitionBy("entity_name").orderBy(
        F.col("c").desc(), F.col("first").asc())
    top_type = votes.withColumn("_rn", F.row_number().over(win)) \
        .where(F.col("_rn") == 1) \
        .select("entity_name", "entity_type")
    merged = (
        ents.groupBy("entity_name")
        .agg(F.array_join(F.array_sort(F.collect_set("description")),
                          GRAPH_FIELD_SEP).alias("description"),
             F.array_sort(F.array_distinct(
                 F.collect_list("source_id"))).alias("source_id"),
             F.count("*").alias("n_mentions"))
    )
    return merged.join(top_type, "entity_name")


def merge_relation_mentions(rels: DataFrame) -> DataFrame:
    """_merge_edges (extractor.py:168-190): per canonical pair —
    weight sum, sorted-set <SEP> description, united keywords and
    source ids, mention count."""
    return (
        rels.groupBy("src_id", "tgt_id")
        .agg(F.sum("weight").alias("weight"),
             F.array_join(F.array_sort(F.collect_set("description")),
                          GRAPH_FIELD_SEP).alias("description"),
             F.array_sort(F.array_distinct(
                 F.collect_list("keywords"))).alias("keywords"),
             F.array_sort(F.array_distinct(
                 F.collect_list("source_id"))).alias("source_id"),
             F.count("*").alias("n_mentions"))
    )


def entity_chunks(nodes: DataFrame, kb_id: str = "kb") -> DataFrame:
    """graph_node_to_chunk (graphrag/utils.py:302-326): the search-doc
    row the index side writes per merged entity — title/content huqie
    token fields, the meta JSON (json.dumps key order = the extractor's
    node_data insertion order: entity_type, description, source_id,
    entity_name — extractor.py:160-166), keyword/source columns.  The
    reference's ``id`` is get_uuid() and the ``q_*_vec`` column an
    embedding call — both nondeterministic/model seams, omitted (the
    deterministic content-hash id scheme the reference defines at
    utils.py:298-299 is exercised in pytest via extractlib.xxh64).

    Arrow-batched: tokenization and JSON assembly are per-row Python
    (the same huqie path every tokenize query uses), over the merged
    entity table — one row per entity, never per mention."""
    import json as _json

    import pandas as pd

    def gen(it):
        from ragflow_spark.extractlib.huqie import (
            fine_grained_tokenize, tokenize)
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                meta = dict(entity_type=r.entity_type,
                            description=r.description,
                            source_id=list(r.source_id))
                meta["entity_name"] = r.entity_name
                ltks = tokenize(r.description)
                rows.append({
                    "entity_kwd": r.entity_name,
                    "knowledge_graph_kwd": "entity",
                    "entity_type_kwd": r.entity_type,
                    "important_kwd": r.entity_name,
                    "title_tks": tokenize(r.entity_name),
                    "content_with_weight":
                        _json.dumps(meta, ensure_ascii=False),
                    "content_ltks": ltks,
                    "content_sm_ltks": fine_grained_tokenize(ltks),
                    "source_ids": "|".join(r.source_id),
                    "kb_id": kb_id,
                    "available_int": 0,
                })
            yield pd.DataFrame(rows)

    return nodes.mapInPandas(
        gen,
        schema="entity_kwd string, knowledge_graph_kwd string, "
               "entity_type_kwd string, important_kwd string, "
               "title_tks string, content_with_weight string, "
               "content_ltks string, content_sm_ltks string, "
               "source_ids string, kb_id string, available_int int")


def relation_chunks(edges: DataFrame, kb_id: str = "kb") -> DataFrame:
    """graph_edge_to_chunk (graphrag/utils.py:354-377): the search-doc
    row per merged relation — meta JSON in the extractor's edge_data
    key order (src_id, tgt_id, description, keywords, weight,
    source_id — extractor.py:183-190), ``weight_int = int(weight)``
    (Python truncation), keyword list as important_kwd.  uuid id and
    embedding are the same seams as entity_chunks."""
    import json as _json

    import pandas as pd

    def gen(it):
        from ragflow_spark.extractlib.huqie import (
            fine_grained_tokenize, tokenize)
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                meta = dict(src_id=r.src_id, tgt_id=r.tgt_id,
                            description=r.description,
                            keywords=list(r.keywords),
                            weight=float(r.weight),
                            source_id=list(r.source_id))
                ltks = tokenize(r.description)
                rows.append({
                    "from_entity_kwd": r.src_id,
                    "to_entity_kwd": r.tgt_id,
                    "knowledge_graph_kwd": "relation",
                    "content_with_weight":
                        _json.dumps(meta, ensure_ascii=False),
                    "content_ltks": ltks,
                    "content_sm_ltks": fine_grained_tokenize(ltks),
                    "important_kwd": "|".join(r.keywords),
                    "weight_int": int(r.weight),
                    "source_ids": "|".join(r.source_id),
                    "kb_id": kb_id,
                    "available_int": 0,
                })
            yield pd.DataFrame(rows)

    return edges.mapInPandas(
        gen,
        schema="from_entity_kwd string, to_entity_kwd string, "
               "knowledge_graph_kwd string, content_with_weight "
               "string, content_ltks string, content_sm_ltks string, "
               "important_kwd string, weight_int long, source_ids "
               "string, kb_id string, available_int int")


def subgraph_gate(ents: DataFrame, rels: DataFrame,
                  doc_col: str = "chunk_key"):
    """generate_subgraph's endpoint gate (graphrag/general/
    index.py:145-157): a parsed relation joins a document's subgraph
    only when BOTH endpoints were extracted as entities of the SAME
    document; relations failing the gate are counted as ignored, as
    the reference's ``ignored_rels`` progress message does.

    ``tidy_graph`` (graphrag/utils.py:160-190) purges nodes/edges
    whose attribute DICTS lack description/source_id and defaults
    ``keywords`` to [] — relational rows always carry every column, so
    the purge has nothing to act on here and the keywords default is
    applied at parse time (parse_extraction_records never emits a null
    keywords array).

    Returns ``(kept_rels, stats)``: kept_rels is ``rels`` filtered to
    in-document endpoints; stats is one row per document —
    (doc, n_nodes, n_edges, ignored_rels) over distinct entity names /
    canonical pairs, which is what the merged per-doc subgraph holds.
    Both sides are plain semi/anti joins keyed on (doc, name) — no
    driver-side graph object, unlike the reference's one-networkx-
    per-doc build.
    """
    names = ents.select(doc_col, "entity_name").distinct()
    s = names.withColumnRenamed("entity_name", "src_id")
    t = names.withColumnRenamed("entity_name", "tgt_id")
    kept = (rels.join(s, [doc_col, "src_id"], "semi")
            .join(t, [doc_col, "tgt_id"], "semi"))

    n_nodes = names.groupBy(doc_col).agg(
        F.count("*").alias("n_nodes"))
    pairs = rels.select(doc_col, "src_id", "tgt_id").distinct()
    kept_pairs = (pairs.join(s, [doc_col, "src_id"], "semi")
                  .join(t, [doc_col, "tgt_id"], "semi"))
    tot = pairs.groupBy(doc_col).agg(F.count("*").alias("_tot"))
    kc = kept_pairs.groupBy(doc_col).agg(F.count("*").alias("n_edges"))
    # full outer: a doc whose response parsed only relations (no
    # entities at all) still reports its ignored count, as the
    # reference's per-rel loop does
    stats = (n_nodes.join(tot, doc_col, "full")
             .join(kc, doc_col, "left")
             .select(doc_col,
                     F.coalesce("n_nodes", F.lit(0)).alias("n_nodes"),
                     F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
                     (F.coalesce("_tot", F.lit(0))
                      - F.coalesce("n_edges", F.lit(0)))
                     .alias("ignored_rels")))
    return kept, stats


def light_glean_fold(turns: DataFrame,
                     max_gleanings: int = 3) -> DataFrame:
    """The LightRAG extractor's gleaning fold
    (graphrag/light/graph_extractor.py:83-110) — the deterministic
    conversation bookkeeping around the per-chunk chat seam:

    - token_count starts at tokens(hint_prompt + initial);
    - history = pack_user_ass("Output:", initial, continue_prompt)
      (utils.py:279-284 role alternation — only the contents matter
      for the token arithmetic, newline-joined);
    - per glean round: history gains [glean, continue_prompt], then
      token_count += tokens(join(history) + hint + continue_prompt),
      final_result += glean (NO separator — records may span glean
      boundaries, and the parser sees the concatenation);
    - the loop breaks at max_gleanings-1 WITHOUT consulting the
      continuation seam; otherwise token_count += tokens(join(history)
      + if_loop_result + if_loop_prompt) and the light-specific
      normalization ``strip().strip('"').strip("'").lower() != "yes"``
      stops the fold (the general extractor instead compares the raw
      response to "YES" — graph_extractor.py:133).

    Input columns: chunk_key, seq, hint_prompt, initial,
    gleans array<string> (max_gleanings entries), ifloops
    array<string>, continue_prompt, ifloop_prompt.  Output: one row
    per chunk with final_result, n_gleans, token_count.  Map-only
    Arrow stage (the pinned token counter is Python); nothing
    shuffles.
    """
    import pandas as pd

    from ragflow_spark.extractlib.tokens import num_tokens_from_string

    def fold(it):
        for pdf in it:
            recs = []
            for r in pdf.itertuples(index=False):
                tc = num_tokens_from_string(r.hint_prompt + r.initial)
                history = ["Output:", r.initial, r.continue_prompt]
                final = r.initial
                n = 0
                for g in range(max_gleanings):
                    glean = r.gleans[g]
                    history.extend([glean, r.continue_prompt])
                    tc += num_tokens_from_string(
                        "\n".join(history) + r.hint_prompt
                        + r.continue_prompt)
                    final += glean
                    n += 1
                    if g == max_gleanings - 1:
                        break
                    ifl = r.ifloops[g]
                    tc += num_tokens_from_string(
                        "\n".join(history) + ifl + r.ifloop_prompt)
                    if ifl.strip().strip('"').strip("'").lower() \
                            != "yes":
                        break
                recs.append((r.chunk_key, int(r.seq), final, n, tc))
            yield pd.DataFrame(
                recs, columns=["chunk_key", "seq", "final_result",
                               "n_gleans", "token_count"])

    return turns.mapInPandas(
        fold, schema=("chunk_key string, seq long, "
                      "final_result string, n_gleans int, "
                      "token_count long"))
