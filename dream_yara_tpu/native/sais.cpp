// SA-IS suffix array construction (induced sorting), O(n).
//
// Native analog of the reference's SeqAn suffix-array construction used by
// indexCreate(FibreSALF()) (SURVEY.md §2.4 [U]) — the offline indexer hot
// spot. From-scratch textbook SA-IS (Nong, Zhang, Chan 2009): classify S/L
// types, induced-sort LMS substrings, name + recurse, induce the final SA.
// The input is copied to int32 with a unique smallest virtual sentinel
// appended, so arbitrary byte texts (including repeated 0x05 bin sentinels)
// are handled.
//
// Build: g++ -O3 -march=native -shared -fPIC sais.cpp -o libdysais.so

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

using std::vector;

void get_buckets(const int32_t* T, int32_t n, int32_t K,
                 vector<int32_t>& bkt, bool end) {
    std::fill(bkt.begin(), bkt.end(), 0);
    for (int32_t i = 0; i < n; i++) bkt[T[i]]++;
    int32_t sum = 0;
    for (int32_t k = 0; k < K; k++) {
        sum += bkt[k];
        bkt[k] = end ? sum : sum - bkt[k];
    }
}

void induce(const int32_t* T, int32_t* SA, int32_t n, int32_t K,
            const vector<bool>& is_s, vector<int32_t>& bkt) {
    // induce L-type from sorted LMS/S placements
    get_buckets(T, n, K, bkt, false);
    for (int32_t i = 0; i < n; i++) {
        int32_t j = SA[i] - 1;
        if (SA[i] > 0 && !is_s[j]) SA[bkt[T[j]]++] = j;
    }
    // induce S-type right-to-left
    get_buckets(T, n, K, bkt, true);
    for (int32_t i = n - 1; i >= 0; i--) {
        int32_t j = SA[i] - 1;
        if (SA[i] > 0 && is_s[j]) SA[--bkt[T[j]]] = j;
    }
}

// T[n-1] must be a unique smallest sentinel.
void sais(const int32_t* T, int32_t* SA, int32_t n, int32_t K) {
    if (n == 1) { SA[0] = 0; return; }
    vector<bool> is_s(n);
    is_s[n - 1] = true;
    for (int32_t i = n - 2; i >= 0; i--)
        is_s[i] = T[i] < T[i + 1] || (T[i] == T[i + 1] && is_s[i + 1]);
    auto is_lms = [&](int32_t i) {
        return i > 0 && is_s[i] && !is_s[i - 1];
    };

    vector<int32_t> bkt(K);
    // 1) rough sort: LMS suffixes at bucket ends, induce everything
    std::fill(SA, SA + n, -1);
    get_buckets(T, n, K, bkt, true);
    for (int32_t i = n - 1; i >= 1; i--)
        if (is_lms(i)) SA[--bkt[T[i]]] = i;
    induce(T, SA, n, K, is_s, bkt);

    // 2) compact sorted LMS positions
    int32_t n1 = 0;
    for (int32_t i = 0; i < n; i++)
        if (is_lms(SA[i])) SA[n1++] = SA[i];

    // 3) name LMS substrings (equal substrings share a name)
    std::fill(SA + n1, SA + n, -1);
    int32_t name = 0, prev = -1;
    for (int32_t i = 0; i < n1; i++) {
        int32_t pos = SA[i];
        bool diff = false;
        if (prev < 0) {
            diff = true;
        } else {
            for (int32_t d = 0; d < n; d++) {
                if (T[pos + d] != T[prev + d] || is_s[pos + d] != is_s[prev + d]) {
                    diff = true;
                    break;
                }
                if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) {
                    diff = !(is_lms(pos + d) && is_lms(prev + d));
                    break;
                }
            }
        }
        if (diff) { name++; prev = pos; }
        SA[n1 + pos / 2] = name - 1;
    }
    vector<int32_t> s1(n1);
    for (int32_t i = n - 1, j = n1 - 1; i >= n1; i--)
        if (SA[i] >= 0) s1[j--] = SA[i];

    // 4) sort the reduced problem
    vector<int32_t> SA1(n1);
    if (name < n1) {
        sais(s1.data(), SA1.data(), n1, name);
    } else {
        for (int32_t i = 0; i < n1; i++) SA1[s1[i]] = i;
    }

    // 5) place LMS in final order, induce the rest
    vector<int32_t> lms(n1);
    for (int32_t i = 1, j = 0; i < n; i++)
        if (is_lms(i)) lms[j++] = i;
    std::fill(SA, SA + n, -1);
    get_buckets(T, n, K, bkt, true);
    for (int32_t i = n1 - 1; i >= 0; i--) {
        int32_t j = lms[SA1[i]];
        SA[--bkt[T[j]]] = j;
    }
    induce(T, SA, n, K, is_s, bkt);
}

}  // namespace

extern "C" {

// Suffix array of byte text (values 0..255). SA_out must hold n int32.
int32_t dy_sais_u8(const uint8_t* T, int32_t* SA_out, int32_t n) {
    if (n <= 0) return 0;
    vector<int32_t> T32(n + 1);
    for (int32_t i = 0; i < n; i++) T32[i] = int32_t(T[i]) + 1;
    T32[n] = 0;  // unique smallest virtual sentinel
    vector<int32_t> SA(n + 1);
    sais(T32.data(), SA.data(), n + 1, 257);
    std::memcpy(SA_out, SA.data() + 1, size_t(n) * sizeof(int32_t));
    return 0;
}

}  // extern "C"
