// Differential-test oracle: compiles against the READ-ONLY reference
// parser (/root/reference) and echoes its outputs so pytest can compare
// the Python kernel byte-for-byte. This is a test harness only — no
// reference code is copied into the engine.
//
// Protocol: for each document, stdin carries "<len>\n" followed by len
// bytes. stdout answers with raw_html / to_text() / to_text(true) /
// to_html('\t') blocks, each length-prefixed the same way, plus the
// error count.
#include "html.hpp"
#include <iostream>
#include <string>

int main() {
    std::ios::sync_with_stdio(false);
    std::string line;
    while (std::getline(std::cin, line)) {
        if (line.empty()) continue;
        size_t len = std::stoul(line);
        std::string doc(len, '\0');
        std::cin.read(&doc[0], len);
        std::cin.ignore(1); // trailing newline
        html::parser p;
        int n_err = 0;
        p.set_callback([&](html::err_t, html::node&) { n_err++; });
        auto d = p.parse(doc);
        auto put = [](const std::string& s) {
            std::cout << s.size() << "\n" << s << "\n";
        };
        put(d->to_raw_html());
        put(d->to_text());
        put(d->to_text(true));
        put(d->to_html());
        std::cout << n_err << "\n";
        std::cout.flush();
    }
    return 0;
}
