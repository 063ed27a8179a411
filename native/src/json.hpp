// Minimal JSON parser for vk.json / proof.json (strings, numbers, arrays,
// objects - the subset export.cpp/verifier.py emit).  Zero dependencies.
#pragma once

#include <cctype>
#include <map>
#include <memory>
#include <string>
#include <vector>
#include <stdexcept>

namespace ethsnarks {
namespace json {

struct Value;
typedef std::shared_ptr<Value> ValuePtr;

struct Value {
    enum Type { STRING, ARRAY, OBJECT } type;
    std::string str;
    std::vector<ValuePtr> arr;
    std::map<std::string, ValuePtr> obj;
};

class Parser {
  public:
    explicit Parser(const std::string &text) : s_(text), pos_(0) {}

    ValuePtr parse() {
        skip_ws();
        ValuePtr v = parse_value();
        skip_ws();
        return v;
    }

  private:
    const std::string s_;  // by value: callers may pass temporaries
    size_t pos_;

    void skip_ws() {
        while (pos_ < s_.size() && std::isspace((unsigned char)s_[pos_]))
            ++pos_;
    }

    char peek() {
        if (pos_ >= s_.size()) throw std::runtime_error("json: eof");
        return s_[pos_];
    }

    void expect(char c) {
        if (peek() != c) throw std::runtime_error("json: expected char");
        ++pos_;
    }

    ValuePtr parse_value() {
        skip_ws();
        char c = peek();
        if (c == '"') return parse_string();
        if (c == '[') return parse_array();
        if (c == '{') return parse_object();
        // bare number: capture as string
        auto v = std::make_shared<Value>();
        v->type = Value::STRING;
        size_t start = pos_;
        while (pos_ < s_.size() &&
               (std::isalnum((unsigned char)s_[pos_]) || s_[pos_] == '-' ||
                s_[pos_] == '+' || s_[pos_] == '.'))
            ++pos_;
        v->str = s_.substr(start, pos_ - start);
        if (v->str.empty()) throw std::runtime_error("json: bad value");
        return v;
    }

    ValuePtr parse_string() {
        expect('"');
        auto v = std::make_shared<Value>();
        v->type = Value::STRING;
        while (peek() != '"') {
            char c = s_[pos_++];
            if (c == '\\') {
                v->str.push_back(s_[pos_++]);
            } else {
                v->str.push_back(c);
            }
        }
        ++pos_;
        return v;
    }

    ValuePtr parse_array() {
        expect('[');
        auto v = std::make_shared<Value>();
        v->type = Value::ARRAY;
        skip_ws();
        if (peek() == ']') {
            ++pos_;
            return v;
        }
        while (true) {
            v->arr.push_back(parse_value());
            skip_ws();
            if (peek() == ']') {
                ++pos_;
                return v;
            }
            expect(',');
        }
    }

    ValuePtr parse_object() {
        expect('{');
        auto v = std::make_shared<Value>();
        v->type = Value::OBJECT;
        skip_ws();
        if (peek() == '}') {
            ++pos_;
            return v;
        }
        while (true) {
            skip_ws();
            ValuePtr key = parse_string();
            skip_ws();
            expect(':');
            v->obj[key->str] = parse_value();
            skip_ws();
            if (peek() == '}') {
                ++pos_;
                return v;
            }
            expect(',');
        }
    }
};

}  // namespace json
}  // namespace ethsnarks
