"""Object loading by dotted name (drop-in for reference
util/loading.py:31-85): ``find_object`` imports a fully-qualified name
with optional blacklist/whitelist prefix filters; ``RenamingUnpickler``
remaps class names while unpickling (schema-evolution tool)."""

from __future__ import annotations

import pickle


def find_object(name: str, blacklist=None, whitelist=None):
    """Import and return the object at dotted ``name``
    (e.g. ``"whoosh_ray.analysis.StopFilter"``)."""
    if blacklist:
        for pre in blacklist:
            if name.startswith(pre):
                raise TypeError(f"{name!r}: can't instantiate names "
                                f"starting with {pre!r}")
    if whitelist:
        if not any(name.startswith(pre) for pre in whitelist):
            raise TypeError(f"Can't instantiate {name!r}")
    lastdot = name.rfind(".")
    assert lastdot > -1, f"Name {name!r} must be fully qualified"
    modname = name[:lastdot]
    clsname = name[lastdot + 1:]
    mod = __import__(modname, fromlist=[clsname])
    return getattr(mod, clsname)


class RenamingUnpickler(pickle.Unpickler):
    """``pickle.Unpickler`` with class-name remapping before load."""

    def __init__(self, f, objmap: dict, shortcuts=None):
        super().__init__(f)
        if shortcuts:
            objmap = {k % shortcuts: v % shortcuts
                      for k, v in objmap.items()}
        self._objmap = objmap

    def find_class(self, modulename: str, objname: str):
        fqname = f"{modulename}.{objname}"
        fqname = self._objmap.get(fqname, fqname)
        try:
            return find_object(fqname)
        except ImportError:
            raise ImportError(f"Couldn't find {fqname!r}") from None
