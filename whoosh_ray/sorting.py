"""Drop-in sorting/faceting surface (reference whoosh/sorting.py
names); FacetType/Facet classes live in whoosh_ray.search.facets.

The reference's Categorizer machinery (ColumnCategorizer,
OverlappingCategorizer, PostingCategorizer, ...) is the per-document
iterator layer its collectors consume; the engine's facet evaluation is
vectorized per segment, so those names intentionally have no
counterpart (semantics covered by the facet classes themselves —
test_facets output-matches every facet type against the reference)."""

from whoosh_ray.search.facets import (  # noqa: F401
    Best,
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
