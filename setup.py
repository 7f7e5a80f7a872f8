from setuptools import find_packages, setup

from ciri_long_tpu.version import __version__

setup(
    name='ciri-long-tpu',
    version=__version__,
    description='TPU-native circular RNA identification from Nanopore long reads',
    packages=find_packages(include=['ciri_long_tpu', 'ciri_long_tpu.*']),
    python_requires='>=3.10',
    install_requires=[
        'jax',
        'numpy',
    ],
    entry_points={
        'console_scripts': [
            'CIRI-long-tpu=ciri_long_tpu.cli.main:main',
        ],
    },
)
