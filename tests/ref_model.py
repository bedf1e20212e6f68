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
        for nm in d.get("authors", []):
            nodes.add(("Person", uri(nm), nm))
            edges.add((uri(nm), d["doc_id"], "AUTHOR"))
        for nm in d.get("recipients", []):
            nodes.add(("Person", uri(nm), nm))
            edges.add((uri(nm), d["doc_id"], "RECIPIENT"))
        if d.get("location_name"):
            nodes.add(("Place", uri(d["location_name"]), d["location_name"]))
            edges.add((d["doc_id"], uri(d["location_name"]), "LOCATION"))
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
                edges.add((d["doc_id"], k, "HAS_" + main_o["type"].upper()))
                if mid_o:
                    mk = mid_o["uri"] or mid_o["term"]
                    nodes.add((node_label(mid_o["type"]), mk, mid_o["term"]))
                    edges.add((k, mk, "MIDSUB"))
                    if sub_o:
                        sk = sub_o["uri"] or sub_o["term"]
                        nodes.add((node_label(sub_o["type"]), sk, sub_o["term"]))
                        edges.add((mk, sk, "SUB"))
    return nodes, edges
