from setuptools import Extension, find_packages, setup

from ciri_long_tpu.version import __version__

fastxcodec = Extension(
    'ciri_long_tpu._fastxcodec',
    sources=['native/fastxcodec.cpp'],
    libraries=['z'],
    extra_compile_args=['-O3', '-march=native', '-std=c++17'],
)

chaincore = Extension(
    'ciri_long_tpu._chaincore',
    sources=['native/chaincore.cpp'],
    extra_compile_args=['-O3', '-march=native', '-std=c++17'],
)

nwcore = Extension(
    'ciri_long_tpu._nwcore',
    sources=['native/nwcore.cpp'],
    extra_compile_args=['-O3', '-march=native', '-std=c++17'],
)

alncore = Extension(
    'ciri_long_tpu._alncore',
    sources=['native/alncore.cpp'],
    extra_compile_args=['-O3', '-march=native', '-std=c++17'],
)

poacore = Extension(
    'ciri_long_tpu._poacore',
    sources=['native/poacore.cpp'],
    extra_compile_args=['-O3', '-march=native', '-std=c++17'],
)

ccscore = Extension(
    'ciri_long_tpu._ccscore',
    sources=['native/ccscore.cpp'],
    extra_compile_args=['-O3', '-march=native', '-std=c++17'],
)

setup(
    name='ciri-long-tpu',
    version=__version__,
    description='TPU-native circular RNA identification from Nanopore long reads',
    packages=find_packages(include=['ciri_long_tpu', 'ciri_long_tpu.*']),
    ext_modules=[fastxcodec, chaincore, nwcore, poacore, alncore, ccscore],
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
