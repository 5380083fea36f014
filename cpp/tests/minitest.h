// Minimal gtest-style test harness (the image ships no gtest).
//
// Role parity with the reference's gtest suites under
// test/cpp/dynamic_embedding/ and torchrec/inference/tests/: named
// TEST(Suite, Name) cases with auto-registration, EXPECT_*/ASSERT_*
// macros that report file:line on failure, per-test status lines, and a
// process exit code the python driver checks. A failing EXPECT records
// the failure and keeps going; a failing ASSERT aborts the current test.
//
// Usage:
//     #include "minitest.h"
//     TEST(Suite, Name) { EXPECT_EQ(1 + 1, 2); }
//     int main() { return minitest::run_all("my_test"); }

#ifndef TORCHREC_TPU_CPP_TESTS_MINITEST_H_
#define TORCHREC_TPU_CPP_TESTS_MINITEST_H_

#include <cstdio>
#include <string>
#include <vector>

namespace minitest {

struct Case {
  const char* suite;
  const char* name;
  void (*fn)();
};

inline std::vector<Case>& cases() {
  static std::vector<Case> c;
  return c;
}

inline bool& current_failed() {
  static bool failed = false;
  return failed;
}

struct Registrar {
  Registrar(const char* suite, const char* name, void (*fn)()) {
    cases().push_back({suite, name, fn});
  }
};

inline void report_failure(const char* file, int line, const std::string& msg) {
  std::fprintf(stderr, "  FAIL %s:%d: %s\n", file, line, msg.c_str());
  current_failed() = true;
}

// Runs every registered test; prints gtest-like per-case lines. Returns 0
// iff all passed, and prints a final line containing "PASS" (the python
// driver greps for it) only on full success.
inline int run_all(const char* binary_name) {
  int failed = 0;
  for (const Case& c : cases()) {
    current_failed() = false;
    std::printf("[ RUN  ] %s.%s\n", c.suite, c.name);
    c.fn();
    if (current_failed()) {
      ++failed;
      std::printf("[ FAIL ] %s.%s\n", c.suite, c.name);
    } else {
      std::printf("[  OK  ] %s.%s\n", c.suite, c.name);
    }
  }
  if (failed) {
    std::printf("%s: %d/%zu tests FAILED\n", binary_name, failed,
                cases().size());
    return 1;
  }
  std::printf("%s PASS (%zu tests)\n", binary_name, cases().size());
  return 0;
}

}  // namespace minitest

#define TEST(Suite, Name)                                               \
  static void minitest_##Suite##_##Name();                              \
  static ::minitest::Registrar minitest_reg_##Suite##_##Name(           \
      #Suite, #Name, &minitest_##Suite##_##Name);                       \
  static void minitest_##Suite##_##Name()

#define MINITEST_CHECK_(cond, text, abort_stmt)                         \
  do {                                                                  \
    if (!(cond)) {                                                      \
      ::minitest::report_failure(__FILE__, __LINE__, text);             \
      abort_stmt;                                                       \
    }                                                                   \
  } while (0)

#define EXPECT_TRUE(cond) MINITEST_CHECK_((cond), "expected: " #cond, )
#define ASSERT_TRUE(cond) MINITEST_CHECK_((cond), "required: " #cond, return)

#define EXPECT_EQ(a, b)                                                 \
  MINITEST_CHECK_((a) == (b),                                           \
                  "expected: " #a " == " #b " (got " +                  \
                      std::to_string(static_cast<long long>(a)) +       \
                      " vs " + std::to_string(static_cast<long long>(b)) + \
                      ")", )
#define ASSERT_EQ(a, b)                                                 \
  MINITEST_CHECK_((a) == (b),                                           \
                  "required: " #a " == " #b " (got " +                  \
                      std::to_string(static_cast<long long>(a)) +       \
                      " vs " + std::to_string(static_cast<long long>(b)) + \
                      ")", return)
#define EXPECT_NE(a, b) MINITEST_CHECK_((a) != (b), "expected: " #a " != " #b, )
#define EXPECT_FLOAT_EQ(a, b)                                           \
  MINITEST_CHECK_((a) == (b),                                           \
                  "expected: " #a " == " #b " (got " +                  \
                      std::to_string(static_cast<double>(a)) + " vs " + \
                      std::to_string(static_cast<double>(b)) + ")", )

#endif  // TORCHREC_TPU_CPP_TESTS_MINITEST_H_
