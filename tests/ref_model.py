"""Independent pure-Python model of the reference pipeline semantics,
written from the SURVEY.md spec (not copied code). Used as the test
oracle for the Spark pipeline plan.

Semantics modeled (citations into /root/reference/):
- normalize_term: xml_to_json.py:7-14
- parenthetical strip: xml_to_json.py:34-36
- first-wins tuple dedup per doc: xml_to_json.py:24-44
- known entities (authors/recipients=person, location=place):
  json_classification.py:313-320
- convert_name incl. substring-title + ' de ' quirks:
  json_classification.py:40-67
- term objects, empty parts → 'term': json_classification.py:258-277
- URIs on non-'term' entities: generate_uri.py:5-26, :29-67
- graph nodes/edges: json_to_db.py:7-127
"""

from __future__ import annotations

import hashlib
import re

TITLE_KEYWORDS = [
    "Baron", "Sir", "Dr.", "Lord", "Dame", "Count", "Countess", "King",
    "Queen", "Prince", "Princess", "Duke", "Duchess", "marquis",
    "marchioness", "von", "de",
]

LABELS = ["person", "place", "organization", "term"]


def normalize(term: str) -> str:
    return re.sub(r"\s+", " ", term).strip().lower()


def strip_paren(s: str) -> str:
    return re.sub(r"\(.*?\)", "", s).strip()


def uri(s: str) -> str:
    cleaned = s.lower().replace(" ", "").replace(",", "")
    h = hashlib.sha256(cleaned.encode()).hexdigest()
    return "r" + str(int(h[:8], 16) % 100000000)


def convert_name(name: str) -> str:
    if "," in name:
        parts = name.split(", ")
        if len(parts) == 2:
            last, rest = parts
            titles = []
            for kw in TITLE_KEYWORDS:
                if kw in rest:
                    titles.append(kw)
                    rest = rest.replace(kw, "").strip()
            if titles:
                return f"{' '.join(titles)} {rest} de {last}"
            return f"{rest} {last}"
    return name


def echo_label(norm_term: str) -> str:
    h = hashlib.md5(norm_term.encode()).hexdigest()
    return LABELS[int(h[:12], 16) % 4]


def classify(norm_term: str, known: dict[str, str]) -> str:
    if norm_term in known:
        return known[norm_term]
    return echo_label(norm_term)


def run_reference_model(docs: list[dict]) -> tuple[set, set]:
    """docs: [{doc_id, title, authors[], recipients[], location_name,
    date_from, date_to, indexing: [(main, midsub, sub)]}]
    → (nodes, edges) sets matching build_document_graph output."""
    known: dict[str, str] = {}
    for d in docs:
        for nm in d.get("authors", []) + d.get("recipients", []):
            known.setdefault(normalize(nm), "person")
        if d.get("location_name"):
            known.setdefault(normalize(d["location_name"]), "place")

    nodes: set = set()
    edges: set = set()

    def term_obj(raw: str):
        if not raw:
            return None
        label = classify(normalize(raw), known)
        term = convert_name(raw) if label == "person" else raw
        u = uri(term) if label != "term" else None
        return {"term": term, "type": label, "uri": u}

    def node_label(label: str) -> str:
        return {"person": "Person", "place": "Place",
                "organization": "Organization"}.get(label, "Term")

    for d in docs:
        nodes.add(("Document", d["doc_id"], d.get("title") or d["doc_id"]))
        # convert_name runs in the classification stage
        # (json_classification.py:233-237) BEFORE generate_uri hashes
        # the name (generate_uri.py:50-53), so Person nodes carry the
        # converted name and the URI hashes the converted string.
        # create_relationship (json_to_db.py:46-52) MERGEs
        # (e)-[:ROLE]->(d): entity → document for AUTHOR/RECIPIENT/
        # LOCATION and all typed HAS_* edges.
        for rel, names in (("AUTHOR", d.get("authors", [])),
                           ("RECIPIENT", d.get("recipients", []))):
            for nm in names:
                conv = convert_name(nm)
                nodes.add(("Person", uri(conv), conv))
                edges.add((uri(conv), d["doc_id"], rel))
        if d.get("location_name"):
            nodes.add(("Place", uri(d["location_name"]), d["location_name"]))
            edges.add((uri(d["location_name"]), d["doc_id"], "LOCATION"))
        for rel, key in (("DATE_FROM", "date_from"), ("DATE_TO", "date_to")):
            v = d.get(key)
            if v:
                nodes.add(("Date", v, v))
                edges.add((d["doc_id"], v, rel))

        seen = set()
        for raw_main, raw_mid, raw_sub in d.get("indexing", []):
            main_s = strip_paren(raw_main or "")
            mid_s = strip_paren(raw_mid or "")
            sub_s = strip_paren(raw_sub or "")
            if (main_s, mid_s, sub_s) in seen:
                continue
            seen.add((main_s, mid_s, sub_s))
            main_o = term_obj(main_s)
            mid_o = term_obj(mid_s)
            sub_o = term_obj(sub_s)
            if main_o:
                k = main_o["uri"] or main_o["term"]
                nodes.add((node_label(main_o["type"]), k, main_o["term"]))
                if main_o["type"] == "term":
                    # relate_index_term: (d)-[:HAS_TERM]->(t)
                    edges.add((d["doc_id"], k, "HAS_TERM"))
                else:
                    # create_relationship: (e)-[:HAS_*]->(d)
                    edges.add((k, d["doc_id"], "HAS_" + main_o["type"].upper()))
                # relate_sub_term (json_to_db.py:63-69, :121-127):
                # midsub/sub NODES are always MERGEd (create_term,
                # keyed by term text), but the Cypher MATCHes the
                # parent as (p:<ParentType> {term: $parent_term}) and
                # typed nodes carry only name/uri (create_person/
                # place/organization, :16-32) — zero rows for typed
                # parents, so the MIDSUB/SUB EDGE only materializes
                # under Term parents (reference quirk, reproduced
                # bug-for-bug; build_document_graph default). Both
                # edges hang off the MAIN term's text.
                for rel, o in (("MIDSUB", mid_o), ("SUB", sub_o)):
                    if o:
                        nodes.add(("Term", o["term"], o["term"]))
                        if main_o["type"] == "term":
                            edges.add((k, o["term"], rel))
    return nodes, edges
