// Host beam-search decoder for CRF basecalling.
//
// C++ port of the reference beam search (algorithmic parity with
// dorado/basecall/decode/beam_search.cpp:126-520 and this repo's golden
// numpy implementation in dorado_tpu/decode/beam_search.py): fixed-width
// beam over k-mer states, CRC32C sequence hashing, stay/step log-sum-exp
// merging, score cutoff with binary-search width control, and
// posterior-derived per-base qualities.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr uint32_t kCrcPoly = 0x82F63B78u;
constexpr uint32_t kCrcSeed = 0x12345678u;

struct CrcTables {
    uint32_t t2[4];
    uint32_t t8[256];
    CrcTables() {
        auto fill = [](uint32_t* table, int nbits) {
            const int size = 1 << nbits;
            for (int v = 0; v < size; ++v) {
                uint32_t crc = static_cast<uint32_t>(v);
                for (int i = 0; i < nbits; ++i) {
                    const uint32_t b = crc & 1u;
                    crc >>= 1;
                    if (b) {
                        crc ^= kCrcPoly;
                    }
                }
                table[v] = crc;
            }
        };
        fill(t2, 2);
        fill(t8, 8);
    }
};
const CrcTables kCrc;

inline uint32_t crc32c_2bit(uint32_t crc, uint32_t new_bits) {
    const uint32_t folded = crc ^ (new_bits & 3u);
    return (folded >> 2) ^ kCrc.t2[folded & 3u];
}

inline uint32_t crc32c_32bit(uint32_t crc, uint32_t word) {
    uint32_t folded = crc ^ word;
    for (int i = 0; i < 4; ++i) {
        folded = (folded >> 8) ^ kCrc.t8[folded & 0xFFu];
    }
    return folded;
}

inline float log_sum_exp(float x, float y) {
    const float d = std::abs(x - y);
    return std::max(x, y) + (d < 17.0f ? std::log1p(std::exp(-d)) : 0.0f);
}

}  // namespace

extern "C" {

// scores [T, C] f32, back_guide [T+1, S] f32, posts [T+1, S] f32.
// Outputs: states [T] i32, moves [T] u8, qual_data [T, 4] f32, score.
// Returns 0 on success.
int dt_beam_search(const float* scores,
                   int num_blocks,
                   int c_dim,
                   const float* back_guide,
                   const float* posts,
                   int beam_width,
                   float beam_cut,
                   float fixed_stay_score,
                   int32_t* states_out,
                   uint8_t* moves_out,
                   float* qual_out,
                   float* score_out) {
    const int num_states = c_dim / 4;
    int num_state_bits = 0;
    while ((1 << num_state_bits) < num_states) {
        ++num_state_bits;
    }
    if ((1 << num_state_bits) != num_states || beam_width > 256) {
        return -2;
    }
    const uint32_t states_mask = static_cast<uint32_t>(num_states - 1);
    const float kMin = std::numeric_limits<float>::lowest();
    const float log_beam_cut =
            beam_cut > 0.0f ? std::log(beam_cut) : std::numeric_limits<float>::max();

    std::vector<int32_t> hist_state(static_cast<size_t>(num_blocks + 1) * beam_width);
    std::vector<int32_t> hist_parent(static_cast<size_t>(num_blocks + 1) * beam_width);
    std::vector<uint8_t> hist_stay(static_cast<size_t>(num_blocks + 1) * beam_width);

    std::vector<int32_t> beam_state(beam_width);
    std::vector<uint32_t> beam_hash(beam_width);
    std::vector<float> beam_score(beam_width, 0.0f);

    // Init from the top back-guide states, in state order.
    int cur_width = 0;
    {
        const float* bg0 = back_guide;
        if (beam_width < num_states) {
            std::vector<float> sorted(bg0, bg0 + num_states);
            std::nth_element(sorted.begin(), sorted.begin() + (num_states - beam_width),
                             sorted.end());
            const float threshold = sorted[num_states - beam_width];
            for (int s = 0; s < num_states && cur_width < beam_width; ++s) {
                if (bg0[s] >= threshold) {
                    beam_state[cur_width] = s;
                    beam_hash[cur_width] =
                            crc32c_32bit(kCrcSeed, static_cast<uint32_t>(s));
                    beam_score[cur_width] = 0.0f;
                    hist_state[cur_width] = s;
                    ++cur_width;
                }
            }
        } else {
            for (int s = 0; s < num_states; ++s) {
                beam_state[s] = s;
                beam_hash[s] = crc32c_32bit(kCrcSeed, static_cast<uint32_t>(s));
                hist_state[s] = s;
            }
            cur_width = num_states;
        }
    }

    constexpr int kHashBits = 4096;
    constexpr uint32_t kHashMask = kHashBits - 1;
    std::vector<uint8_t> step_hash_present(kHashBits);

    const int max_cands = beam_width * 5;
    std::vector<int32_t> cand_state(max_cands);
    std::vector<uint32_t> cand_hash(max_cands);
    std::vector<int32_t> cand_parent(max_cands);
    std::vector<float> cand_score(max_cands);
    std::vector<uint8_t> cand_stay(max_cands);

    for (int block_idx = 0; block_idx < num_blocks; ++block_idx) {
        const float* block_scores = scores + static_cast<size_t>(block_idx) * c_dim;
        const float* block_back = back_guide + static_cast<size_t>(block_idx + 1) * num_states;

        std::memset(step_hash_present.data(), 0, kHashBits);

        // Step candidates: [elem*4 + base].
        for (int e = 0; e < cur_width; ++e) {
            const uint32_t prev = static_cast<uint32_t>(beam_state[e]);
            const uint32_t shifted = (prev << 2) & states_mask;
            // dropped oldest base: 16-bit shift semantics of the reference
            const uint32_t dropped = ((prev << 2) & 0xFFFFu) >> num_state_bits;
            for (uint32_t base = 0; base < 4; ++base) {
                const uint32_t st = shifted | base;
                const int idx = e * 4 + static_cast<int>(base);
                cand_state[idx] = static_cast<int32_t>(st);
                cand_hash[idx] = crc32c_2bit(beam_hash[e], base);
                cand_parent[idx] = e;
                cand_score[idx] = beam_score[e] + block_scores[(st << 2) + dropped] +
                                  block_back[st];
                cand_stay[idx] = 0;
                step_hash_present[cand_hash[idx] & kHashMask] = 1;
            }
        }
        // Stay candidates, appended after the steps.
        for (int e = 0; e < cur_width; ++e) {
            const int idx = cur_width * 4 + e;
            cand_state[idx] = beam_state[e];
            cand_hash[idx] = beam_hash[e];
            cand_parent[idx] = e;
            cand_score[idx] = beam_score[e] + fixed_stay_score + block_back[beam_state[e]];
            cand_stay[idx] = 1;
        }
        const int n_cands = cur_width * 5;

        // Merge stays with identical-sequence steps.
        for (int e = 0; e < cur_width; ++e) {
            const int stay_elem = cur_width * 4 + e;
            if (!step_hash_present[cand_hash[stay_elem] & kHashMask]) {
                continue;
            }
            const int stay_latest_base = beam_state[e] & 3;
            for (int comp = 0; comp < cur_width; ++comp) {
                const int step_elem = (comp << 2) | stay_latest_base;
                if (cand_hash[stay_elem] == cand_hash[step_elem]) {
                    const float folded =
                            log_sum_exp(cand_score[stay_elem], cand_score[step_elem]);
                    if (cand_score[stay_elem] > cand_score[step_elem]) {
                        cand_score[stay_elem] = folded;
                        cand_score[step_elem] = kMin;
                    } else {
                        cand_score[step_elem] = folded;
                        cand_score[stay_elem] = kMin;
                    }
                }
            }
        }

        float max_score = kMin;
        for (int i = 0; i < n_cands; ++i) {
            max_score = std::max(max_score, cand_score[i]);
        }

        // Cutoff with binary-search width control.
        float beam_cutoff = max_score - log_beam_cut;
        auto count_ge = [&](float cut) {
            int n = 0;
            for (int i = 0; i < n_cands; ++i) {
                n += cand_score[i] >= cut;
            }
            return n;
        };
        int elem_count = count_ge(beam_cutoff);
        if (elem_count > beam_width) {
            const int min_width = (beam_width * 8) / 10;
            float lo = beam_cutoff;
            float hi = max_score;
            int guesses = 1;
            while ((elem_count > beam_width || elem_count < min_width) && guesses < 10) {
                if (elem_count > beam_width) {
                    lo = beam_cutoff;
                    beam_cutoff = (beam_cutoff + hi) / 2.0f;
                } else {
                    hi = beam_cutoff;
                    beam_cutoff = (beam_cutoff + lo) / 2.0f;
                }
                elem_count = count_ge(beam_cutoff);
                ++guesses;
            }
            if (guesses == 10) {
                beam_cutoff = hi;
                elem_count = count_ge(beam_cutoff);
            }
            elem_count = std::min(elem_count, beam_width);
        }

        // Keep, in candidate order, up to beam_width survivors.
        int n_kept = 0;
        int32_t* hs = hist_state.data() + static_cast<size_t>(block_idx + 1) * beam_width;
        int32_t* hp = hist_parent.data() + static_cast<size_t>(block_idx + 1) * beam_width;
        uint8_t* hy = hist_stay.data() + static_cast<size_t>(block_idx + 1) * beam_width;
        int32_t kept_state[256];
        uint32_t kept_hash[256];
        float kept_score[256];
        uint8_t kept_stay[256];
        int32_t kept_parent[256];
        for (int i = 0; i < n_cands && n_kept < beam_width; ++i) {
            if (cand_score[i] >= beam_cutoff) {
                kept_state[n_kept] = cand_state[i];
                kept_hash[n_kept] = cand_hash[i];
                kept_parent[n_kept] = cand_parent[i];
                kept_score[n_kept] = cand_score[i];
                kept_stay[n_kept] = cand_stay[i];
                ++n_kept;
            }
        }

        if (block_idx == num_blocks - 1) {
            int best = 0;
            const int lim = std::min(elem_count, n_kept);
            for (int i = 1; i < lim; ++i) {
                if (kept_score[i] > kept_score[best]) {
                    best = i;
                }
            }
            std::swap(kept_state[0], kept_state[best]);
            std::swap(kept_hash[0], kept_hash[best]);
            std::swap(kept_parent[0], kept_parent[best]);
            std::swap(kept_score[0], kept_score[best]);
            std::swap(kept_stay[0], kept_stay[best]);
        }

        for (int i = 0; i < n_kept; ++i) {
            hs[i] = kept_state[i];
            hp[i] = kept_parent[i];
            hy[i] = kept_stay[i];
            beam_state[i] = kept_state[i];
            beam_hash[i] = kept_hash[i];
            beam_score[i] = kept_score[i] - block_back[kept_state[i]];
        }
        cur_width = std::min(elem_count, n_kept);
    }

    *score_out = beam_score[0];

    // Traceback.
    int elem = 0;
    for (int beam_idx = num_blocks; beam_idx > 0; --beam_idx) {
        const size_t row = static_cast<size_t>(beam_idx) * beam_width;
        states_out[beam_idx - 1] = hist_state[row + elem];
        moves_out[beam_idx - 1] = hist_stay[row + elem] ? 0 : 1;
        elem = hist_parent[row + elem];
    }
    moves_out[0] = 1;

    // Per-block base probabilities from posterior mass on the path k-mer and
    // its shifted neighbours (beam_search.cpp:411-470).
    const int msb = num_states >> 2;
    for (int b = 0; b < num_blocks; ++b) {
        const float* t_posts = posts + static_cast<size_t>(b + 1) * num_states;
        const int32_t state = states_out[b];
        const int base = state & 3;
        float block_prob = t_posts[state];
        int32_t shifted[8];
        const int32_t l_shift = state >> 2;
        const int32_t r_shift = (state << 2) % num_states;
        for (int s = 0; s < 4; ++s) {
            shifted[2 * s] = l_shift + msb * s;
            shifted[2 * s + 1] = r_shift + s;
        }
        for (int j = 0; j < 8; ++j) {
            if (shifted[j] == state) {
                continue;
            }
            bool dup = false;
            for (int k = 0; k < j; ++k) {
                if (shifted[k] == shifted[j]) {
                    dup = true;
                    break;
                }
            }
            if (!dup) {
                block_prob += t_posts[shifted[j]];
            }
        }
        block_prob = std::min(std::max(block_prob, 0.0f), 1.0f);
        block_prob = std::pow(block_prob, 0.4f);
        const float wrong = (1.0f - block_prob) / 3.0f;
        float* q = qual_out + static_cast<size_t>(b) * 4;
        for (int k = 0; k < 4; ++k) {
            q[k] = wrong;
        }
        q[base] = block_prob;
    }
    return 0;
}

}  // extern "C"
