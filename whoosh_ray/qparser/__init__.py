"""Drop-in qparser package with the reference's layout.

``from whoosh.qparser import QueryParser, FuzzyTermPlugin, OrGroup``
ports by changing the package name; the submodules mirror the
reference tree (default/plugins/syntax/common/taggers/dateparse), so
deep imports like ``from whoosh.qparser.dateparse import
DateParserPlugin`` port too.  The parsers live in
whoosh_ray.search.qparser; the reference Plugin/group classes are thin
markers the parser constructors translate onto declarative options
(reference qparser/plugins.py:89-1352, syntax.py:395-446, parser
constructors default.py:38-439)."""

from whoosh_ray.qparser.common import (  # noqa: F401
    QueryParserError,
    attach,
    get_single_text,
    print_debug,
    rcompile,
)
from whoosh_ray.qparser.default import (  # noqa: F401
    DisMaxParser,
    MultifieldParser,
    QueryParser,
    SimpleParser,
)
from whoosh_ray.qparser.plugins import (  # noqa: F401
    BoostPlugin,
    CopyFieldPlugin,
    DateParserPlugin,
    EveryPlugin,
    FieldAliasPlugin,
    FieldsPlugin,
    FunctionPlugin,
    FuzzyTermPlugin,
    GroupPlugin,
    GtLtPlugin,
    MultifieldPlugin,
    OperatorsPlugin,
    PhrasePlugin,
    Plugin,
    PlusMinusPlugin,
    PrefixPlugin,
    PseudoFieldPlugin,
    RangePlugin,
    RegexPlugin,
    SequencePlugin,
    SingleQuotePlugin,
    TaggingPlugin,
    WhitespacePlugin,
    WildcardPlugin,
)
from whoosh_ray.qparser.syntax import (  # noqa: F401
    AndGroup,
    AndMaybeGroup,
    AndNotGroup,
    DisMaxGroup,
    NotGroup,
    OrderedGroup,
    OrGroup,
    RequireGroup,
)
from whoosh_ray.qparser.taggers import (  # noqa: F401
    FnTagger,
    RegexTagger,
    Tagger,
)
