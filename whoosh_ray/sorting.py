"""Drop-in sorting/faceting surface (reference whoosh/sorting.py
names); FacetType/Facet classes live in whoosh_ray.search.facets.

The reference's *internal* Categorizer subclasses (ColumnCategorizer,
OverlappingCategorizer, PostingCategorizer, ...) are the per-document
iterator layer its collectors consume; the engine's built-in facet
evaluation is vectorized per segment, so those concrete names
intentionally have no counterpart (semantics covered by the facet
classes themselves — test_facets output-matches every facet type
against the reference).  The *extension* contract survives: subclass
FacetType, return a :class:`Categorizer` from ``categorizer()``, and
sortedby=/groupedby= accept it (tests/test_facets.py
test_custom_categorizer_facet)."""

from whoosh_ray.search.facets import (  # noqa: F401
    Best,
    Categorizer,
    Count,
    DateRangeFacet,
    FacetMap,
    Facets,
    FacetType,
    FieldFacet,
    FunctionFacet,
    MultiFacet,
    OrderedList,
    QueryFacet,
    RangeFacet,
    ScoreFacet,
    StoredFieldFacet,
    TranslateFacet,
    UnorderedList,
)

from whoosh_ray.search.facets import add_sortable  # noqa: E402,F401
