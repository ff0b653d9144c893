import pytest

from dorado_tpu.signal import generate_chunks, generate_variable_chunks


class TestGenerateChunks:
    @pytest.mark.parametrize(
        "args",
        [
            (0, 9996, 6, 498),  # empty read
            (12345, 0, 6, 498),  # chunk_size == 0
            (12345, 9996, 0, 498),  # stride == 0
            (12345, 9996, 10, 498),  # chunk_size % stride != 0
            (12345, 9996, 7, 498),  # overlap % stride != 0
            (12345, 9996, 6, 9996),  # chunk_size <= overlap
            (12345, 9996, 6, 9997),
        ],
    )
    def test_invalid_input(self, args):
        with pytest.raises(ValueError):
            generate_chunks(*args)

    def test_known_offsets(self):
        assert generate_chunks(9996 // 2, 9996, 6, 498) == [0]
        assert generate_chunks(9996, 9996, 6, 498) == [0]
        assert generate_chunks(9996 + 1, 9996, 6, 498) == [0, 6]
        assert generate_chunks(9996 + 9996 // 2, 9996, 6, 498) == [0, 4998]
        assert generate_chunks(2 * 9996 + 9996 // 2, 9996, 1, 0) == [0, 9996, 14994]
        assert generate_chunks(3 * 9996, 9996, 6, 498) == [0, 9498, 18996, 19992]

    @pytest.mark.parametrize(
        "chunk_size,stride,overlap",
        [(9996, 6, 498), (9996, 7, 497), (9996, 12, 492), (555, 5, 25), (83, 1, 13), (123, 1, 0)],
    )
    def test_properties(self, chunk_size, stride, overlap):
        import random

        rng = random.Random(42)
        for _ in range(16):
            num_samples = rng.randint(1024, 2097152)
            offsets = generate_chunks(num_samples, chunk_size, stride, overlap)
            assert offsets
            assert offsets[0] == 0
            for i in range(1, len(offsets) - 1):
                assert offsets[i] % stride == 0
                assert offsets[i] == i * (chunk_size - overlap)
            assert offsets[-1] % stride == 0
            assert offsets[-1] < num_samples
            if len(offsets) > 1:
                assert num_samples - offsets[-1] >= chunk_size - stride
                assert num_samples - offsets[-1] <= chunk_size


class TestGenerateVariableChunks:
    @pytest.mark.parametrize(
        "args",
        [
            (0, 9996, 6, 498),
            (12345, 0, 6, 498),
            (12345, 9996, 0, 498),
            (12345, 9996, 10, 498),
            (12345, 6, 6, 498),  # chunk_size == stride
            (12345, 9996, 7, 498),
            (12345, 9996, 7, 0),  # stride != 1 with no overlap
            (12345, 9996, 6, 9996),
        ],
    )
    def test_invalid_input(self, args):
        with pytest.raises(ValueError):
            generate_variable_chunks(*args)

    @pytest.mark.parametrize(
        "chunk_size,stride,overlap",
        [(9996, 6, 498), (9996, 12, 492), (555, 5, 25), (123, 1, 0)],
    )
    def test_properties(self, chunk_size, stride, overlap):
        import random

        rng = random.Random(7)
        for _ in range(16):
            num_samples = rng.randint(1024, 2097152)
            intervals = generate_variable_chunks(num_samples, chunk_size, stride, overlap)
            assert intervals[0][0] == 0
            assert intervals[-1][1] == num_samples
            for i, (start, end) in enumerate(intervals):
                assert end - start <= chunk_size
                if i > 0:
                    assert start % stride == 0
                if i < len(intervals) - 1:
                    assert end % stride == 0
                    # consecutive chunks overlap (or adjoin when overlap == 0);
                    # stride alignment can shave up to stride-1 from each side
                    assert intervals[i + 1][0] <= end - overlap + 2 * (stride - 1)
