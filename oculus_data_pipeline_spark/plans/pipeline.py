"""The reference pipeline as ONE lazy DataFrame DAG.

Reference (/root/reference/run_pipeline.py:34-77): four subprocess
stages with JSON files on disk between them —
xml_to_json → json_classification → generate_uri → json_to_db.

Here the whole thing is a single declarative plan over the native XML
source; the only materialization points are the two graph-table writes
at the end. Stage boundaries become named DataFrame→DataFrame
functions (individually testable, composable — the reference's
"resumable checkpoints" semantics, SURVEY.md §3.2), and the per-file
ProcessPoolExecutor (run_pipeline.py:104-109) is replaced by Spark's
own partition parallelism: at 100 TB the XML scan fans out across the
cluster with no user-level scheduling.

Semantic parity notes (each cites the reference behavior it preserves):
- term triples are collected with parentheticals stripped per part and
  first-wins per-document dedup (xml_to_json.py:24-44);
- authors/recipients/location form the known-entity table with
  precedence over the classifier (json_classification.py:313-320,
  :258-262), and only terms NOT in it reach the classifier
  (:121-123) — after global distinct (:322-335);
- classified 'person' terms are rendered with convert_name
  (:80-92), other labels keep the raw term;
- URIs go on authors, recipients, location, and non-'term' index
  terms (generate_uri.py:29-67);
- the graph gets Document/Person/Place/Organization/Term/Date nodes
  and AUTHOR/RECIPIENT/LOCATION/DATE_FROM/DATE_TO/HAS_*/MIDSUB/SUB
  edges (json_to_db.py:7-127), built set-wise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import generate_uri, normalize_term, strip_parenthetical, with_converted_name
from ..operators.classify import Classifier, classify_terms

# Explicit schema (SURVEY.md §1.4): inference would collapse
# single-element arrays to scalars and parse dates; the reference keeps
# every scalar a string and every repeated element an array.
DOCUMENT_XML_SCHEMA = T.StructType(
    [
        T.StructField("documentID", T.StringType()),
        T.StructField("documentTitle", T.StringType()),
        T.StructField(
            "projectInfo",
            T.StructType(
                [
                    T.StructField("publicationName", T.StringType()),
                    T.StructField("seriesName", T.StringType()),
                    T.StructField("volumeInfo", T.StringType()),
                    T.StructField("publisher", T.StringType()),
                    T.StructField(
                        "formats",
                        T.StructType(
                            [T.StructField("type", T.ArrayType(T.StringType()))]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField(
            "authors",
            T.StructType([T.StructField("author", T.ArrayType(T.StringType()))]),
        ),
        T.StructField(
            "recipients",
            T.StructType([T.StructField("recipient", T.ArrayType(T.StringType()))]),
        ),
        T.StructField(
            "dates",
            T.StructType(
                [
                    T.StructField("date-from", T.StringType()),
                    T.StructField("date-to", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "location", T.StructType([T.StructField("placeName", T.StringType())])
        ),
        T.StructField(
            "repositories",
            T.StructType([T.StructField("repository", T.ArrayType(T.StringType()))]),
        ),
        T.StructField(
            "indexing",
            T.StructType(
                [
                    T.StructField(
                        "indexTerm",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("main", T.StringType()),
                                    T.StructField("midsub", T.StringType()),
                                    T.StructField("sub", T.StringType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)


def read_documents_xml(spark: SparkSession, path: str) -> DataFrame:
    """S1/S2: native XML scan (xml_to_json.py:47-103 / run_pipeline.py:
    97-102). At scale: splittable scan, column pruning into the parser.

    Normalizes to the canonical nested shape (xml_to_json.py:77-96):
    flat scalars + arrays-of-strings + indexing array of term structs.
    """
    raw = (
        spark.read.format("xml")
        .option("rowTag", "document")
        .schema(DOCUMENT_XML_SCHEMA)
        .load(path)
    )
    return raw.select(
        F.col("documentID").alias("doc_id"),
        F.col("documentTitle").alias("title"),
        F.struct(
            F.col("projectInfo.publicationName").alias("publication_name"),
            F.col("projectInfo.seriesName").alias("series_name"),
            F.col("projectInfo.volumeInfo").alias("volume_info"),
            F.col("projectInfo.publisher").alias("publisher"),
            F.coalesce(F.col("projectInfo.formats.type"), F.array()).alias("formats"),
        ).alias("project_info"),
        F.coalesce(F.col("authors.author"), F.array()).alias("authors"),
        F.coalesce(F.col("recipients.recipient"), F.array()).alias("recipients"),
        F.col("dates.`date-from`").alias("date_from"),
        F.col("dates.`date-to`").alias("date_to"),
        F.col("location.placeName").alias("location_name"),
        F.coalesce(F.col("repositories.repository"), F.array()).alias("repositories"),
        F.coalesce(F.col("indexing.indexTerm"), F.array()).alias("indexing"),
    )


def read_documents_xml_with_quarantine(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Failure-isolating ingest: malformed XML never aborts the job.

    The reference aborts only the failing file and continues
    (run_pipeline.py:55-75); the engine equivalent is PERMISSIVE
    parsing with a corrupt-record column — good documents flow on, bad
    payloads land in a quarantine DataFrame (raw text + source file)
    for reprocessing. Returns (documents, quarantine).
    """
    schema_with_corrupt = T.StructType(
        [*DOCUMENT_XML_SCHEMA.fields, T.StructField("_corrupt_record", T.StringType())]
    )
    raw = (
        spark.read.format("xml")
        .option("rowTag", "document")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema_with_corrupt)
        .load(path)
        # input_file_name() is only defined while the scan is live —
        # capture it before the cache boundary or it comes back ''
        .withColumn("__source_file", F.input_file_name())
    ).cache()
    bad = raw.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_payload"),
        F.col("__source_file").alias("source_file"),
    )
    good = raw.where(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record", "__source_file"
    )
    docs = good.select(
        F.col("documentID").alias("doc_id"),
        F.col("documentTitle").alias("title"),
        F.struct(
            F.col("projectInfo.publicationName").alias("publication_name"),
            F.col("projectInfo.seriesName").alias("series_name"),
            F.col("projectInfo.volumeInfo").alias("volume_info"),
            F.col("projectInfo.publisher").alias("publisher"),
            F.coalesce(F.col("projectInfo.formats.type"), F.array()).alias("formats"),
        ).alias("project_info"),
        F.coalesce(F.col("authors.author"), F.array()).alias("authors"),
        F.coalesce(F.col("recipients.recipient"), F.array()).alias("recipients"),
        F.col("dates.`date-from`").alias("date_from"),
        F.col("dates.`date-to`").alias("date_to"),
        F.col("location.placeName").alias("location_name"),
        F.coalesce(F.col("repositories.repository"), F.array()).alias("repositories"),
        F.coalesce(F.col("indexing.indexTerm"), F.array()).alias("indexing"),
    )
    return docs, bad


def compact_small_files(
    spark: SparkSession, src: str, dst: str, target_files: int
) -> None:
    """Small-file compaction for ingest landing zones (SURVEY §4 risk
    c: many tiny XML/JSON files make scan planning the bottleneck).
    Reads, coalesces without a shuffle, rewrites as ``target_files``
    parquet files."""
    spark.read.parquet(src).coalesce(target_files).write.mode("overwrite").parquet(dst)


def extract_terms(docs: DataFrame) -> DataFrame:
    """P4/D1: flatten term triples with parenthetical-strip per part and
    first-occurrence-wins per-document dedup (xml_to_json.py:24-44).

    Returns (doc_id, pos, main, midsub, sub) — pos preserves document
    order so downstream output is deterministic.
    """
    exploded = docs.select(
        "doc_id", F.posexplode_outer("indexing").alias("pos", "t")
    ).where(F.col("t").isNotNull())
    cleaned = exploded.select(
        "doc_id",
        "pos",
        strip_parenthetical(F.coalesce(F.col("t.main"), F.lit(""))).alias("main"),
        strip_parenthetical(F.coalesce(F.col("t.midsub"), F.lit(""))).alias("midsub"),
        strip_parenthetical(F.coalesce(F.col("t.sub"), F.lit(""))).alias("sub"),
    )
    w = W.partitionBy("doc_id", "main", "midsub", "sub").orderBy("pos")
    return (
        cleaned.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def known_entities_from_docs(docs: DataFrame) -> DataFrame:
    """J1: authors/recipients → 'person', location → 'place', keyed by
    the normalized name (json_classification.py:313-320). Small by
    construction → broadcast at the probe site.

    Null-safe on the JSON ingest surface (r10 review): a NULL
    authors/recipients ARRAY no longer nulls out `concat` (losing the
    other side's names from the known set), and NULL name ELEMENTS are
    dropped instead of emitting a junk NULL norm_term row — the
    reference crashes on both (normalize_term does re.sub on None,
    json_classification.py:70-78)."""
    empty = F.array().cast("array<string>")
    persons = (
        docs.select(
            F.explode(
                F.concat(
                    F.coalesce("authors", empty), F.coalesce("recipients", empty)
                )
            ).alias("name")
        )
        .where(F.col("name").isNotNull())
        .select(normalize_term("name").alias("norm_term"), F.lit("person").alias("label"))
    )
    places = (
        docs.where(F.col("location_name").isNotNull())
        .select(
            normalize_term("location_name").alias("norm_term"),
            F.lit("place").alias("label"),
        )
    )
    return persons.unionByName(places).dropDuplicates(["norm_term"])


def classify_document_terms(
    terms: DataFrame, known: DataFrame, classifier: Classifier
) -> DataFrame:
    """U1/J2/J3: classify each of main/midsub/sub with known-entity
    precedence; empty parts label 'term' (json_classification.py:
    258-277 — empty midsub/sub default to TERM at :263-264).

    Unpivots the 3 parts into rows so the classifier sees ONE distinct
    term column (the reference's global distinct set, :322-335), then
    repivots back to columns.
    """
    parts = (
        terms.unpivot(
            ["doc_id", "pos", "main", "midsub", "sub"],
            ["main", "midsub", "sub"],
            "part",
            "term",
        )
        .where(F.length("term") > 0)
        # pivot output columns are named after the part VALUES; prefix
        # them so they don't collide with the main/midsub/sub key cols
        .withColumn("part", F.concat(F.lit("p_"), F.col("part")))
    )
    labeled = classify_terms(parts, classifier, known_entities=known)
    # person terms render via convert_name (json_classification.py:80-92)
    labeled = with_converted_name(labeled, "term", "term_display")
    labeled = labeled.withColumn(
        "term_display",
        F.when(F.col("label") == "person", F.col("term_display")).otherwise(
            F.col("term")
        ),
    )
    pivoted = (
        labeled.groupBy("doc_id", "pos", "main", "midsub", "sub")
        .pivot("part", ["p_main", "p_midsub", "p_sub"])
        .agg(
            F.first(
                F.struct(
                    F.col("term_display").alias("term"),
                    F.col("label").alias("type"),
                )
            )
        )
        .withColumnsRenamed(
            {"p_main": "main_obj", "p_midsub": "midsub_obj", "p_sub": "sub_obj"}
        )
    )
    def term_obj(obj_col: str, raw_col: str):
        # empty part → {term: '', type: 'term'} placeholder; NULL obj
        # only happens for empty raws (filtered above)
        return F.when(
            F.length(raw_col) > 0,
            F.struct(
                F.col(f"{obj_col}.term").alias("term"),
                F.col(f"{obj_col}.type").alias("type"),
                F.when(
                    F.col(f"{obj_col}.type") != "term",
                    generate_uri(F.col(f"{obj_col}.term")),
                ).alias("uri"),
            ),
        )

    return pivoted.select(
        "doc_id",
        "pos",
        term_obj("main_obj", "main").alias("main"),
        term_obj("midsub_obj", "midsub").alias("midsub"),
        term_obj("sub_obj", "sub").alias("sub"),
    )


def build_document_graph(
    docs: DataFrame, classified: DataFrame, typed_parent_sub_edges: bool = False
):
    """K5/K6/K7: nodes + edges DataFrames (json_to_db.py:78-127
    re-expressed set-wise; ~13 serial txns/doc → 2 bulk writes).

    nodes(label, key, name); edges(src, dst, rel_type) where Document
    src/dst keys are doc ids and entity keys are URIs / term text.

    Entity dispatch is NULL-safe via the same canonical-label policy as
    operators/graph.py (r10): any type outside person/place/organization
    — including NULL and unknown strings — is the reference else-branch
    plain index term (json_to_db.py:118-119), keyed by TERM TEXT with a
    (d)-[:HAS_TERM]->(t) edge, even when the staged JSON carries a
    stored uri for it (add_uri_if_needed writes one for every non-'term'
    type, generate_uri.py:43-45, but relate_index_term/create_term key
    by term text alone, json_to_db.py:34-38,54-60 — the stored uri is
    dead weight there).

    Reference quirk, reproduced bug-for-bug (default): relate_sub_term
    (json_to_db.py:63-69) MATCHes the parent as
    ``(p:<ParentType> {term: $parent_term})``, but typed nodes are
    MERGEd with only ``name``/``uri`` properties (create_person/place/
    organization, :16-32) — the MATCH yields zero rows for any typed
    parent, so the Cypher MERGEs after it never run: midsub/sub EDGES
    exist only under Term parents. The sub term NODES always exist (the
    separate create_term call at :122,:126 runs unconditionally).
    ``typed_parent_sub_edges=True`` restores the evident intent
    (parent_type is threaded through deliberately) and emits MIDSUB/SUB
    edges under typed parents too, sourced at the parent's uri key.
    """
    from ..operators.graph import canonical_label
    doc_nodes = docs.select(
        F.lit("Document").alias("label"),
        F.col("doc_id").alias("key"),
        F.coalesce("title", F.col("doc_id")).alias("name"),
    )
    author_people = docs.select(F.col("doc_id"), F.explode("authors").alias("raw_name")).withColumn(
        "rel", F.lit("AUTHOR")
    )
    recipient_people = docs.select(
        F.col("doc_id"), F.explode("recipients").alias("raw_name")
    ).withColumn("rel", F.lit("RECIPIENT"))
    # convert_name runs in the classification stage (json_classification
    # .py:233-237), BEFORE the URI stage hashes the name (generate_uri
    # .py:50-53) — so reference Person nodes carry the converted
    # 'First Last' name and the URI hashes the converted string.
    # NULL name elements (possible only on the JSON ingest surface —
    # from_xml yields '' for empty <author/> tags) are dropped: the
    # reference crashes there (convert_name does `',' in None`,
    # json_classification.py:51), and the staged path's classify stage
    # drops them too — emitting a NULL-key Person node would diverge
    # from both (r10 review). Empty-STRING names pass through: the
    # reference MERGEs a Person with name '' and uri hash('').
    people = with_converted_name(
        author_people.unionByName(recipient_people).where(
            F.col("raw_name").isNotNull()
        ),
        "raw_name",
        "name",
    ).withColumn("uri", generate_uri("name"))
    person_nodes = people.select(
        F.lit("Person").alias("label"), F.col("uri").alias("key"), "name"
    )
    person_edges = people.select(
        F.col("uri").alias("src"), F.col("doc_id").alias("dst"), F.col("rel").alias("rel_type")
    )

    locs = docs.where(F.col("location_name").isNotNull()).select(
        "doc_id", F.col("location_name").alias("name")
    ).withColumn("uri", generate_uri("name"))
    loc_nodes = locs.select(F.lit("Place").alias("label"), F.col("uri").alias("key"), "name")
    # create_relationship (json_to_db.py:46-52) MERGEs (e)-[:LOCATION]->(d):
    # entity → document, same as AUTHOR/RECIPIENT.
    loc_edges = locs.select(
        F.col("uri").alias("src"), F.col("doc_id").alias("dst"), F.lit("LOCATION").alias("rel_type")
    )

    dates = (
        docs.select("doc_id", F.col("date_from").alias("date"), F.lit("DATE_FROM").alias("rel"))
        .unionByName(
            docs.select("doc_id", F.col("date_to").alias("date"), F.lit("DATE_TO").alias("rel"))
        )
        .where(F.col("date").isNotNull() & (F.length("date") > 0))
    )
    date_nodes = dates.select(F.lit("Date").alias("label"), F.col("date").alias("key"), F.col("date").alias("name"))
    date_edges = dates.select(
        F.col("doc_id").alias("src"), F.col("date").alias("dst"), F.col("rel").alias("rel_type")
    )

    def entity_cols(obj):
        canon = canonical_label(obj["type"])
        label = (
            F.when(canon == "person", "Person")
            .when(canon == "place", "Place")
            .when(canon == "organization", "Organization")
            .otherwise("Term")
        )
        # else-branch (canonical 'term', incl. NULL/unknown types) is
        # keyed by TERM TEXT even when a stored uri exists; typed
        # entities by their uri, re-derived when the staged JSON lacks
        # one (generate_uri is deterministic, so coalesce == stored)
        key = F.when(canon == "term", obj["term"]).otherwise(
            F.coalesce(obj["uri"], generate_uri(obj["term"]))
        )
        return canon, label, key

    main_c, main_l, main_k = entity_cols(F.col("main"))
    term_nodes = classified.where(F.col("main").isNotNull()).select(
        main_l.alias("label"), main_k.alias("key"), F.col("main.term").alias("name")
    )
    # Edge direction per json_to_db.py: typed entities use
    # create_relationship (:46-52) — (e)-[:HAS_*]->(d), entity →
    # document; plain terms use relate_index_term (:54-60) —
    # (d)-[:HAS_TERM]->(t), document → term. Dispatch on the CANONICAL
    # label so NULL/unknown types take the else branch (HAS_TERM,
    # doc → term) instead of a NULL rel_type entity→doc edge.
    main_is_term = main_c == "term"
    term_edges = classified.where(F.col("main").isNotNull()).select(
        F.when(main_is_term, F.col("doc_id")).otherwise(main_k).alias("src"),
        F.when(main_is_term, main_k).otherwise(F.col("doc_id")).alias("dst"),
        F.concat(F.lit("HAS_"), F.upper(main_c)).alias("rel_type"),
    )

    # relate_sub_term (json_to_db.py:63-69, :121-127): sub term NODES
    # are always MERGEd (create_term, keyed by term text) but the
    # MIDSUB/SUB EDGES only materialize under Term parents — see the
    # quirk note in the docstring. Both edges hang off the MAIN term
    # (relate_sub_term gets term['term'] as the parent for midsub and
    # sub alike), matched by term text for Term parents.
    sub_parent_ok = (
        F.lit(True) if typed_parent_sub_edges else (main_c == "term")
    )
    sub_nodes = []
    sub_edges = []
    for child in ("midsub", "sub"):
        has_child = classified.where(F.col(child).isNotNull() & F.col("main").isNotNull())
        sub_nodes.append(
            has_child.select(
                F.lit("Term").alias("label"),
                F.col(f"{child}.term").alias("key"),
                F.col(f"{child}.term").alias("name"),
            )
        )
        sub_edges.append(
            has_child.where(sub_parent_ok).select(
                main_k.alias("src"),
                F.col(f"{child}.term").alias("dst"),
                F.lit(child.upper()).alias("rel_type"),
            )
        )

    nodes = doc_nodes
    for part in [person_nodes, loc_nodes, date_nodes, term_nodes, *sub_nodes]:
        nodes = nodes.unionByName(part)
    edges = person_edges
    for part in [loc_edges, date_edges, term_edges, *sub_edges]:
        edges = edges.unionByName(part)
    return nodes.distinct(), edges.distinct()


def run_pipeline(
    spark: SparkSession, xml_path: str, classifier: Classifier
) -> tuple[DataFrame, DataFrame]:
    """The whole reference pipeline, one lazy DAG: XML → graph tables."""
    docs = read_documents_xml(spark, xml_path)
    terms = extract_terms(docs)
    known = known_entities_from_docs(docs)
    classified = classify_document_terms(terms, known, classifier)
    return build_document_graph(docs, classified)
