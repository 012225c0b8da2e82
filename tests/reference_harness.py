"""Run the REFERENCE exporter mechanically and return its triple set.

The reference imports rdflib (not installed here) and its
dax_parser.py:172 uses a backslash inside an f-string expression
(Python ≥3.12 only; this sandbox runs 3.11), so:

- a minimal rdflib stand-in (Graph = set of triples, URIRef/Literal/
  BNode/Namespace) is registered in sys.modules before any reference
  import — it implements exactly the surface owl.py touches;
- dax_parser is loaded through a source-level shim replacing the
  f-string-embedded ``'\\"'`` literal with ``chr(34)`` (semantically
  identical).

Nothing here copies reference logic — it *drives* the reference to
produce golden triples the engine is compared against.
"""

from __future__ import annotations

import sys
import types

REF = "/root/reference"

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"


class URIRef(str):
    pass


class BNode:
    _n = 0

    def __init__(self):
        BNode._n += 1
        self.id = f"_:b{BNode._n}"

    def __hash__(self):
        return hash(self.id)

    def __eq__(self, other):
        return isinstance(other, BNode) and self.id == other.id

    def __str__(self):
        return self.id


class Literal:
    def __init__(self, value, datatype=None, lang=None):
        if isinstance(value, bool):
            self.lexical = "true" if value else "false"
        else:
            self.lexical = str(value)
        self.datatype = datatype

    def __hash__(self):
        return hash((self.lexical, self.datatype))

    def __eq__(self, other):
        return (
            isinstance(other, Literal)
            and self.lexical == other.lexical
            and self.datatype == other.datatype
        )

    def __str__(self):
        return self.lexical


class Namespace(str):
    def __getattr__(self, key):
        if key.startswith("__"):
            raise AttributeError(key)
        return URIRef(self + key)

    def __getitem__(self, key):
        return URIRef(self + key)


class Graph:
    def __init__(self):
        self.triples_set = set()

    def add(self, triple):
        self.triples_set.add(triple)

    def bind(self, *a, **k):
        pass

    def __contains__(self, triple):
        return triple in self.triples_set

    def __iter__(self):
        return iter(self.triples_set)

    def __len__(self):
        return len(self.triples_set)

    def serialize(self, format="xml"):
        return ""


def install_stub_rdflib() -> None:
    if "rdflib" in sys.modules:
        return
    rdflib = types.ModuleType("rdflib")
    ns_mod = types.ModuleType("rdflib.namespace")
    for name, val in [
        ("RDF", Namespace(RDF_NS)),
        ("RDFS", Namespace(RDFS_NS)),
        ("OWL", Namespace(OWL_NS)),
        ("XSD", Namespace(XSD_NS)),
    ]:
        setattr(ns_mod, name, val)
        setattr(rdflib, name, val)
    for name, val in [
        ("Graph", Graph),
        ("Namespace", Namespace),
        ("Literal", Literal),
        ("URIRef", URIRef),
        ("BNode", BNode),
    ]:
        setattr(rdflib, name, val)
    rdflib.namespace = ns_mod
    sys.modules["rdflib"] = rdflib
    sys.modules["rdflib.namespace"] = ns_mod


def _load_patched_dax_parser() -> None:
    """Pre-register powerbi_ontology.dax_parser compiled from shimmed
    source (the only 3.12-ism in the reference)."""
    name = "powerbi_ontology.dax_parser"
    if name in sys.modules:
        return
    path = f"{REF}/powerbi_ontology/dax_parser.py"
    src = open(path, encoding="utf-8").read()
    src = src.replace("'\\\"'", "chr(34)")
    mod = types.ModuleType(name)
    mod.__file__ = path
    # register BEFORE exec: @dataclass resolves string annotations via
    # sys.modules[cls.__module__]
    sys.modules[name] = mod
    exec(compile(src, path, "exec"), mod.__dict__)


def import_reference():
    """Returns (powerbi_ontology package, OWLExporter class)."""
    install_stub_rdflib()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _load_patched_dax_parser()
    import powerbi_ontology  # noqa: F401

    from powerbi_ontology.export.owl import OWLExporter

    return sys.modules["powerbi_ontology"], OWLExporter


def reference_triples(model_data: dict, pbix_path: str) -> tuple[set, str]:
    """Run extract → generate → export on the reference and return
    (set of (subj, pred, obj) with prefixed names + canonical bnodes,
    ontology_name)."""
    import json
    import zipfile

    _, OWLExporter = import_reference()
    from powerbi_ontology.extractor import PowerBIExtractor
    from powerbi_ontology.ontology_generator import OntologyGenerator

    with zipfile.ZipFile(pbix_path, "w") as zf:
        zf.writestr("DataModel/model.bim", json.dumps(model_data))

    model = PowerBIExtractor(str(pbix_path)).extract()
    ontology = OntologyGenerator(model).generate()
    exporter = OWLExporter(ontology)
    exporter.add_rls_rules(model.security_rules)
    exporter.export(format="xml")

    base = exporter.base_uri  # ".../<safe(name)>#"
    onto_node = base.rstrip("#")
    safe_onto = (
        ontology.name.replace(" ", "_").replace("-", "_").replace(".", "_")
    )
    prefixes = [
        (base, "ont:"),
        (RDF_NS, "rdf:"),
        (RDFS_NS, "rdfs:"),
        (OWL_NS, "owl:"),
        (XSD_NS, "xsd:"),
    ]

    def norm(node):
        if isinstance(node, BNode):
            return node  # canonicalized below
        if isinstance(node, Literal):
            return str(node)
        s = str(node)
        if s == onto_node:
            return "ont:" + safe_onto
        for ns, p in prefixes:
            if s.startswith(ns):
                return p + s[len(ns):]
        return s

    raw = [(norm(s), norm(p), norm(o)) for (s, p, o) in exporter.graph]
    return canonicalize_bnodes(raw), ontology.name


def canonicalize_bnodes(triples) -> set:
    """Rename blank nodes to content-derived ids so two graphs with
    different bnode labels compare equal iff structurally equal:
    restriction bnodes by their owl:onProperty object, EntityConstraint
    bnodes by (constraintType, constraintValue)."""

    def is_b(n):
        return isinstance(n, BNode) or (isinstance(n, str) and n.startswith("_:"))

    names: dict = {}
    by_subj: dict = {}
    for s, p, o in triples:
        if is_b(s):
            by_subj.setdefault(s, []).append((p, o))
    for b, pos in by_subj.items():
        d = dict(pos)
        if "owl:onProperty" in d:
            names[b] = f"_:restriction({d['owl:onProperty']})"
        elif "ont:constraintType" in d:
            names[b] = (
                f"_:entityconstraint({d.get('ont:constraintType')},"
                f"{d.get('ont:constraintValue')})"
            )
        else:
            names[b] = f"_:anon({sorted(map(str, d.items()))})"

    def r(n):
        return names.get(n, str(n) if is_b(n) else n)

    return {(r(s), p, r(o)) for (s, p, o) in triples}
