"""Snowball stemmer classes (reference lang/snowball/__init__.py):
one class per language plus the ``classes`` registry keyed by ISO
code.  Function-form stemmers (what the engine's analyzers compile)
live in whoosh_ray/functions/snowball.py."""

from whoosh_ray.lang.snowball.danish import DanishStemmer
from whoosh_ray.lang.snowball.dutch import DutchStemmer
from whoosh_ray.lang.snowball.english import EnglishStemmer
from whoosh_ray.lang.snowball.finnish import FinnishStemmer
from whoosh_ray.lang.snowball.french import FrenchStemmer
from whoosh_ray.lang.snowball.german import GermanStemmer
from whoosh_ray.lang.snowball.hungarian import HungarianStemmer
from whoosh_ray.lang.snowball.italian import ItalianStemmer
from whoosh_ray.lang.snowball.norwegian import NorwegianStemmer
from whoosh_ray.lang.snowball.portugese import PortugueseStemmer
from whoosh_ray.lang.snowball.romanian import RomanianStemmer
from whoosh_ray.lang.snowball.russian import RussianStemmer
from whoosh_ray.lang.snowball.spanish import SpanishStemmer
from whoosh_ray.lang.snowball.swedish import SwedishStemmer

classes = {"da": DanishStemmer,
           "nl": DutchStemmer,
           "en": EnglishStemmer,
           "fi": FinnishStemmer,
           "fr": FrenchStemmer,
           "de": GermanStemmer,
           "hu": HungarianStemmer,
           "it": ItalianStemmer,
           "no": NorwegianStemmer,
           "pt": PortugueseStemmer,
           "ro": RomanianStemmer,
           "ru": RussianStemmer,
           "es": SpanishStemmer,
           "sv": SwedishStemmer}
