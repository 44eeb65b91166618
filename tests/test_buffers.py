"""Medusa tree-buffer tests pinned to golden values extracted from the reference
``generate_medusa_buffers`` (reference: whisper_medusa/models/medusa_utils.py:305-421,
executed on CPU to record the expected arrays below)."""

import numpy as np
import pytest

from whisper_medusa_tpu.decoding.buffers import generate_medusa_buffers

GOLDEN = {
    (1, 1, 1): dict(
        tree_indices=[0, 1, 2],
        pos=[0, 1, 2],
        retrieve=[[0, 1, 2]],
        mask=[[1, 0, 0], [1, 1, 0], [1, 1, 1]],
    ),
    (1, 2, 3): dict(
        tree_indices=[0, 1, 2, 3, 4, 5, 3, 4, 5],
        pos=[0, 1, 1, 2, 2, 2, 2, 2, 2],
        retrieve=[[0, 1, 3], [0, 1, 4], [0, 1, 5], [0, 2, 6], [0, 2, 7], [0, 2, 8]],
        mask=[
            [1, 0, 0, 0, 0, 0, 0, 0, 0],
            [1, 1, 0, 0, 0, 0, 0, 0, 0],
            [1, 0, 1, 0, 0, 0, 0, 0, 0],
            [1, 1, 0, 1, 0, 0, 0, 0, 0],
            [1, 1, 0, 0, 1, 0, 0, 0, 0],
            [1, 1, 0, 0, 0, 1, 0, 0, 0],
            [1, 0, 1, 0, 0, 0, 1, 0, 0],
            [1, 0, 1, 0, 0, 0, 0, 1, 0],
            [1, 0, 1, 0, 0, 0, 0, 0, 1],
        ],
    ),
    (1, 1, 2, 2): dict(
        tree_indices=[0, 1, 2, 3, 4, 5, 4, 5],
        pos=[0, 1, 2, 2, 3, 3, 3, 3],
        retrieve=[[0, 1, 2, 4], [0, 1, 2, 5], [0, 1, 3, 6], [0, 1, 3, 7]],
        mask=[
            [1, 0, 0, 0, 0, 0, 0, 0],
            [1, 1, 0, 0, 0, 0, 0, 0],
            [1, 1, 1, 0, 0, 0, 0, 0],
            [1, 1, 0, 1, 0, 0, 0, 0],
            [1, 1, 1, 0, 1, 0, 0, 0],
            [1, 1, 1, 0, 0, 1, 0, 0],
            [1, 1, 0, 1, 0, 0, 1, 0],
            [1, 1, 0, 1, 0, 0, 0, 1],
        ],
    ),
}


@pytest.mark.parametrize("choices", sorted(GOLDEN))
def test_buffers_match_reference_golden(choices):
    g = GOLDEN[choices]
    b = generate_medusa_buffers(choices)
    np.testing.assert_array_equal(b.tree_indices, g["tree_indices"])
    np.testing.assert_array_equal(b.position_ids, g["pos"])
    np.testing.assert_array_equal(b.retrieve_indices, g["retrieve"])
    np.testing.assert_array_equal(b.attn_mask.astype(int), g["mask"])


def test_buffer_invariants():
    b = generate_medusa_buffers([1, 3, 2, 2])
    # Every path visits strictly deeper levels.
    for p in range(b.num_paths):
        nodes = b.retrieve_indices[p]
        assert list(b.position_ids[nodes]) == list(range(b.num_levels))
        # Ancestor mask holds along each path.
        for i in range(b.num_levels):
            for j in range(i + 1):
                assert b.attn_mask[nodes[i], nodes[j]]
    # Chain detection.
    assert generate_medusa_buffers([1, 1, 1]).is_chain
    assert not b.is_chain


def test_buffer_validation():
    with pytest.raises(ValueError):
        generate_medusa_buffers([2, 1])
    with pytest.raises(ValueError):
        generate_medusa_buffers([1, 0])
