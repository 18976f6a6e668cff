"""Installer: data-directory management for external likelihood data.

Counterpart of reference install.py:204. The reference pip-installs theory
codes and downloads data archives; in this framework all theory is
in-package, so the Installer only manages where user-provided data files
(SN compilations, window matrices, Planck products) live, persisting the
configuration like the reference does (~/.desilike_tpu/config.yaml).
"""

import os

import yaml

from .utils import BaseClass


CONFIG_FN = os.path.expanduser('~/.desilike_tpu/config.yaml')


class Installer(BaseClass):

    def __init__(self, data_dir=None, config_fn=CONFIG_FN):
        self.config_fn = config_fn
        self.config = {}
        if os.path.exists(config_fn):
            with open(config_fn, 'r') as f:
                self.config = yaml.safe_load(f) or {}
        if data_dir is not None:
            self.config['data_dir'] = str(data_dir)

    @property
    def data_dir(self):
        return self.config.get('data_dir', os.path.expanduser('~/.desilike_tpu/data'))

    def data_fn(self, *names):
        return os.path.join(self.data_dir, *names)

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
            'into the data directory {} manually'.format(url, self.data_dir))
