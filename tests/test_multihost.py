"""Multi-host scaffolding: mesh construction + idempotent init (fast tier;
no compiles). The sharded full-proof path over these meshes is covered by
tests/test_spmd.py (slow)."""

import pytest

import tests.conftest  # noqa: F401

import jax

from swirl.parallel import multihost


def test_initialize_single_process_noop():
    multihost.initialize()
    multihost.initialize()  # idempotent


def test_proof_mesh_covers_all_devices():
    mesh = multihost.proof_mesh()
    assert mesh.axis_names == ("rows",)
    assert mesh.devices.size == len(jax.devices())


def test_host_local_mesh_prefix():
    mesh = multihost.host_local_mesh(4)
    assert mesh.devices.size == 4


def test_hierarchical_mesh_single_host():
    mesh = multihost.hierarchical_mesh()
    assert mesh.axis_names == ("host", "chip")
    assert mesh.devices.shape == (1, len(jax.devices()))


def test_proof_mesh_accepted_by_fused_signature():
    """The mesh built here is the exact object prove_fused consumes."""
    from swirl.prover.fused import _mesh_key

    mesh = multihost.proof_mesh()
    key = _mesh_key(mesh)
    assert key[0] == ("rows",)
