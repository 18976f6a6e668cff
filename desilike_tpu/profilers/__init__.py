from .base import BaseProfiler, ScipyProfiler, OptaxProfiler

# reference-name compatibility aliases (PEP 562 lazy to avoid import cycles)
_COMPAT_NAMES = ('MinuitProfiler', 'BOBYQAProfiler')


def __getattr__(name):
    if name in _COMPAT_NAMES:
        from .. import compat
        return getattr(compat, name)
    raise AttributeError('module {!r} has no attribute {!r}'.format(__name__, name))
