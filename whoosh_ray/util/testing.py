"""Test helpers (reference util/testing.py:38-131): context managers
that stand up a throwaway directory / Storage / Index and tear it down,
plus the abstract-method checker and a timing context.

``TempIndex(schema) as ix`` yields a real :class:`whoosh_ray.index.Index`
over a tempdir, so reference-era test suites drive the Ray engine
unchanged.
"""

import os
import shutil
import sys
import tempfile
from contextlib import contextmanager

from whoosh_ray.filedb.filestore import FileStorage
from whoosh_ray.util import now, random_name


class TempDir:
    def __init__(self, basename: str = "", parentdir: str | None = None,
                 ext: str = ".whoosh", suppress=frozenset(),
                 keepdir: bool = False):
        self.basename = basename or random_name(8)
        self.parentdir = parentdir
        dirname = parentdir or tempfile.mkdtemp(ext, self.basename)
        self.dir = os.path.abspath(dirname)
        self.suppress = suppress
        self.keepdir = keepdir

    def __enter__(self):
        os.makedirs(self.dir, exist_ok=True)
        return self.dir

    def cleanup(self):
        pass

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.cleanup()
        if not self.keepdir:
            shutil.rmtree(self.dir, ignore_errors=True)
        if exc_type is not None:
            if self.keepdir:
                sys.stderr.write("Temp dir=" + self.dir + "\n")
            if exc_type not in self.suppress:
                return False


class TempStorage(TempDir):
    def __init__(self, debug: bool = False, **kwargs):
        super().__init__(**kwargs)
        self._debug = debug

    def cleanup(self):
        self.store.close()

    def __enter__(self):
        dirpath = super().__enter__()
        self.store = FileStorage(dirpath)
        return self.store


class TempIndex(TempStorage):
    def __init__(self, schema, ixname: str = "", storage_debug: bool = False,
                 **kwargs):
        super().__init__(basename=ixname, debug=storage_debug, **kwargs)
        self.schema = schema

    def __enter__(self):
        fstore = super().__enter__()
        return fstore.create_index(self.schema, indexname=self.basename)


def is_abstract_method(attr) -> bool:
    return getattr(attr, "__isabstractmethod__", False)


def check_abstract_methods(base, subclass):
    """Raise if ``subclass`` leaves any public abstract method of
    ``base`` unimplemented."""
    for attrname in dir(base):
        if attrname.startswith("_"):
            continue
        if is_abstract_method(getattr(base, attrname)):
            if is_abstract_method(getattr(subclass, attrname)):
                raise Exception("%s.%s not overridden"
                                % (subclass.__name__, attrname))


@contextmanager
def timing(name: str | None = None):
    t = now()
    yield
    t = now() - t
    print("%s: %0.06f s" % (name or "", t))
