"""Installer: data-directory management for external likelihood data.

Counterpart of reference install.py:204. The reference pip-installs theory
codes and downloads data archives; in this framework all theory is
in-package, so the Installer only manages where user-provided data files
(SN compilations, window matrices, Planck products) live, persisting the
configuration like the reference does (~/.desilike_tpu/config.yaml).

Likelihoods with real-product readers (CMB camspec/hillipop/lollipop/
plik-lite/ACT-DR6-lensing, SN compilations) resolve their data through
:func:`installed_data_dir` when called with neither ``data=`` nor
``data_dir=`` — the role of the reference's
``Installer().data_dir(section, ro=True)`` lookup (ref
act_dr6_lensing.py:108-110). The base directory comes from, in order:
the ``DESILIKE_TPU_DATA_DIR`` environment variable, the persisted config,
then ``~/.desilike_tpu/data``.
"""

import os

import yaml

from .utils import BaseClass


CONFIG_FN = os.path.expanduser('~/.desilike_tpu/config.yaml')
DATA_DIR_ENV = 'DESILIKE_TPU_DATA_DIR'


class Installer(BaseClass):

    def __init__(self, data_dir=None, config_fn=CONFIG_FN, reinstall=False):
        # reinstall is accepted for reference compatibility: with no
        # pip/download machinery (zero-egress build) there is nothing to
        # force-reinstall, but install hooks may consult the flag
        self.config_fn = config_fn
        self.reinstall = bool(reinstall)
        self.config = {}
        if os.path.exists(config_fn):
            with open(config_fn, 'r') as f:
                self.config = yaml.safe_load(f) or {}
        if data_dir is not None:
            self.config['data_dir'] = str(data_dir)

    def data_dir(self, section=None):
        """Base data directory, or the per-``section`` directory: a
        ``{section: {data_dir: ...}}`` config override if present, else
        ``<base>/<section>`` (the reference's sectioned layout)."""
        base = os.environ.get(DATA_DIR_ENV) or self.config.get(
            'data_dir', os.path.expanduser('~/.desilike_tpu/data'))
        if section is None:
            return base
        override = self.config.get(section)
        if isinstance(override, dict) and override.get('data_dir'):
            return str(override['data_dir'])
        return os.path.join(base, section)

    def data_fn(self, *names):
        return os.path.join(self.data_dir(), *names)

    def get(self, name, default=None):
        """Config entry lookup (reference install.py Installer.get)."""
        return self.config.get(name, default)

    @property
    def profile_fn(self):
        """Path of the shell profile the reference exports env config to
        (kept for interface parity; nothing is written unless requested)."""
        return os.path.join(os.path.dirname(self.config_fn), 'profile.sh')

    def write(self):
        os.makedirs(os.path.dirname(self.config_fn), exist_ok=True)
        with open(self.config_fn, 'w') as f:
            yaml.safe_dump(self.config, f)
        return self

    def __call__(self, obj):
        """Run obj.install(self) if defined (reference calculator.install hook)."""
        install = getattr(obj, 'install', None)
        if callable(install):
            install(self)
        return obj

    def download(self, url, target=None):
        raise RuntimeError(
            'this build has no network egress; place the file expected at {} '
            'into the data directory {} manually'.format(url, self.data_dir()))


def installed_data_dir(section):
    """``Installer().data_dir(section)`` if that directory exists on disk,
    else ``None`` — the soft lookup likelihood ``initialize`` methods use
    before falling back to their "provide data=/data_dir=" error."""
    path = Installer().data_dir(section)
    return path if os.path.isdir(path) else None
