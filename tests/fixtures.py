"""Fixture data ported from the reference test suite (FIXTURES.md)."""

from matcha_spark import URI, LangString, RDFLiteral, kw

D = "http://data/example/"
RDFS_LABEL = URI("http://www.w3.org/2000/01/rdf-schema#label")
FOAF_KNOWS = URI("http://xmlns.com/foaf/0.1/knows")

rick = URI(D + "rick")
martin = URI(D + "martin")
katie = URI(D + "katie")
julie = URI(D + "julie")
other_label = URI(D + "other-label")

# F1: 7 triples (test:28-35)
friends = [
    (rick, RDFS_LABEL, "Rick"),
    (martin, RDFS_LABEL, "Martin"),
    (katie, RDFS_LABEL, "Katie"),
    (julie, RDFS_LABEL, "Julie"),
    (rick, FOAF_KNOWS, martin),
    (rick, FOAF_KNOWS, katie),
    (katie, FOAF_KNOWS, julie),
]

# F2: same graph, all-keyword terms (test:38-45)
friends_vectors = [
    (kw("rick"), kw("rdfs/label"), "Rick"),
    (kw("martin"), kw("rdfs/label"), "Martin"),
    (kw("katie"), kw("rdfs/label"), "Katie"),
    (kw("julie"), kw("rdfs/label"), "Julie"),
    (kw("rick"), kw("foaf/knows"), kw("martin")),
    (kw("rick"), kw("foaf/knows"), kw("katie")),
    (kw("katie"), kw("foaf/knows"), kw("julie")),
]

# F3: optional-friends, 10 triples (test:452-465)
optional_friends = [
    (rick, RDFS_LABEL, "Rick"),
    (martin, RDFS_LABEL, "Martin"),
    (katie, RDFS_LABEL, "Katie"),
    (julie, other_label, "Not a robot"),
    (rick, FOAF_KNOWS, martin),
    (rick, FOAF_KNOWS, katie),
    (katie, FOAF_KNOWS, julie),
    ("Martin", kw("name/backwards"), "Nitram"),
    ("Katie", kw("name/backwards"), "Eitak"),
    ("Rick", kw("name/backwards"), "Kcir"),
]

# F4: catalog-data, 17 triples (test:718-739)
catalog_data = [
    (kw("crime"), kw("a"), kw("dcat/Dataset")),
    (kw("crime"), kw("dcterms/title"), "Crime"),
    (kw("crime"), kw("dcterms/spatial"), kw("manchester")),
    (kw("crime"), kw("dcat/spatialResolutionInMeters"), 50),
    (kw("crime"), kw("dcterms/description"), "Has all optional fields"),
    (kw("crime"), kw("dcterms/publisher"), kw("ons")),
    (kw("crime"), kw("dcterms/creator"), kw("moj")),
    (kw("operations"), kw("a"), kw("dcat/Dataset")),
    (kw("operations"), kw("dcterms/title"), "Operational Procedures"),
    (kw("operations"), kw("dcterms/description"), "Has one optional (creator)"),
    (kw("operations"), kw("dcterms/creator"), kw("nhs")),
    (kw("deprivation"), kw("a"), kw("dcat/Dataset")),
    (kw("deprivation"), kw("dcterms/title"), "Covid"),
    (kw("deprivation"), kw("dcterms/description"), "Has one optional (publisher)"),
    (kw("deprivation"), kw("dcterms/publisher"), kw("dluhc")),
    (kw("not-in-results"), kw("a"), kw("Ontology")),
    (kw("not-in-results"), kw("dcterms/title"), "Should not be found"),
]

# F5: john-status (test:521-525)
john_status = [
    (kw("john"), kw("status"), kw("online")),
    (kw("john"), kw("prop1"), "A"),
    (kw("john"), kw("prop1"), "B"),
    (kw("john"), kw("prop2"), kw("x")),
    (kw("john"), kw("prop2"), kw("y")),
]
john_status_b = [
    (kw("john"), kw("status"), kw("online")),
    (kw("john"), kw("prop2"), kw("x")),
    (kw("john"), kw("prop2"), kw("y")),
]

# F6 micro-DBs
tiny_db = [(kw("a"), kw("triple"), kw("here"))]
abc_db = [(kw("a"), kw("b"), kw("c")), (kw("d"), kw("e"), kw("f"))]
nil_db = [(None, kw("label"), "nil label")]
build_db = [
    (kw("s"), kw("p"), kw("o")),
    (kw("s"), kw("p2"), kw("o2")),
    (kw("s2"), kw("p"), kw("o3")),
]
build_1_db = [
    (kw("s"), kw("p"), kw("o")),
    (kw("s"), kw("p2"), kw("o2")),
    (kw("s"), kw("p2"), kw("o3")),
    (kw("s2"), kw("p"), kw("o")),
    (kw("s2"), kw("p2"), kw("o2")),
]
issue_21_db = [
    (1, kw("p"), kw("a")),
    (1, kw("p2"), kw("X")),
    (1, kw("p3"), kw("Z")),
    (3, kw("q"), kw("x")),
]
lang_db = [
    (kw("a"), kw("b"), LangString("foo", "en")),
    (kw("a"), kw("b"), RDFLiteral("foo", "http://some/datatype")),
]


def friends_big():
    """F7: friends + 100k-edge knows chain (test:253-256)."""
    big = list(friends)
    for i in range(100000):
        big.append((URI(D + str(i - 1)), FOAF_KNOWS, URI(D + str(i))))
    return big
