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


def install_stub_cli_deps() -> None:
    """Minimal click/rich stand-ins so powerbi_ontology.cli imports —
    only the decorator/constructor surface cli.py touches at module
    scope; commands are never invoked."""
    if "click" not in sys.modules:
        click = types.ModuleType("click")

        class _Group:
            def __init__(self, fn):
                self.fn = fn

            def command(self, *a, **k):
                return lambda f: f

            def group(self, *a, **k):
                return lambda f: _Group(f)

        click.group = lambda *a, **k: (lambda f: _Group(f))
        click.command = lambda *a, **k: (lambda f: f)
        click.option = lambda *a, **k: (lambda f: f)
        click.argument = lambda *a, **k: (lambda f: f)
        click.version_option = lambda *a, **k: (lambda f: f)
        click.pass_context = lambda f: f
        click.Choice = lambda *a, **k: None
        click.Path = lambda *a, **k: None
        click.Abort = type("Abort", (Exception,), {})
        sys.modules["click"] = click
    if "rich" not in sys.modules:
        rich = types.ModuleType("rich")

        class _Any:
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                return self

            def __getattr__(self, name):
                return _Any()

        for sub in ["console", "progress", "table", "panel"]:
            m = types.ModuleType(f"rich.{sub}")
            for cls in [
                "Console", "Progress", "SpinnerColumn", "TextColumn",
                "BarColumn", "TaskProgressColumn", "Table", "Panel",
            ]:
                setattr(m, cls, _Any)
            sys.modules[f"rich.{sub}"] = m
            setattr(rich, sub, m)
        sys.modules["rich"] = rich


def reference_triples_from_ontology_doc(data: dict) -> tuple[set, str]:
    """Drive the reference's import path: cli._dict_to_ontology →
    OWLExporter — the golden for the engine's ontology_doc loader."""
    import_reference()
    install_stub_cli_deps()
    from powerbi_ontology.cli import _dict_to_ontology
    from powerbi_ontology.export.owl import OWLExporter

    ontology = _dict_to_ontology(data)
    exporter = OWLExporter(ontology)
    exporter.export(format="xml")
    return _normalize_graph(exporter), ontology.name


def _normalize_graph(exporter) -> set:
    base = exporter.base_uri
    onto_node = base.rstrip("#")
    safe_onto = (
        exporter.ontology.name.replace(" ", "_").replace("-", "_").replace(".", "_")
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
            return node
        if isinstance(node, Literal):
            return str(node)
        s = str(node)
        if s == onto_node:
            return "ont:" + safe_onto
        for ns, p in prefixes:
            if s.startswith(ns):
                return p + s[len(ns):]
        return s

    return canonicalize_bnodes(
        [(norm(s), norm(p), norm(o)) for (s, p, o) in exporter.graph]
    )


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
    return _normalize_graph(exporter), ontology.name


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
