// Minimal pugixml-compatible XML DOM, just enough for the reference's
// Mitsuba-XML parser (csrt src/parser/parser.cpp).  Written for the
// refbench harness because the benchmark host has no pugixml install
// and nothing may be installed.  API parity covers exactly the calls
// parser.cpp makes: xml_document::load_file/child, xml_node::child/
// children(name?)/attribute/name/empty/operator bool, xml_attribute::
// value/as_float/as_int/as_bool/as_string/operator bool.
#pragma once

#include <cctype>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

namespace pugi
{

struct xml_attribute_struct
{
    std::string name;
    std::string value;
};

struct xml_node_struct
{
    std::string name;
    std::vector<xml_attribute_struct> attrs;
    std::vector<std::unique_ptr<xml_node_struct>> children;
};

class xml_attribute
{
  public:
    xml_attribute() = default;
    explicit xml_attribute(const xml_attribute_struct *a) : a_(a) {}

    const char *value() const { return a_ ? a_->value.c_str() : ""; }
    const char *as_string(const char *def = "") const
    {
        return a_ ? a_->value.c_str() : def;
    }
    float as_float(float def = 0.0f) const
    {
        return a_ ? std::strtof(a_->value.c_str(), nullptr) : def;
    }
    int as_int(int def = 0) const
    {
        return a_ ? static_cast<int>(std::strtol(a_->value.c_str(), nullptr, 10))
                  : def;
    }
    bool as_bool(bool def = false) const
    {
        if (!a_)
            return def;
        const std::string &v = a_->value;
        return v == "true" || v == "True" || v == "TRUE" || v == "1";
    }
    explicit operator bool() const { return a_ != nullptr; }
    bool operator!() const { return a_ == nullptr; }

  private:
    const xml_attribute_struct *a_ = nullptr;
};

class xml_node;

class xml_node_iterator
{
  public:
    xml_node_iterator(const xml_node_struct *parent, size_t idx,
                      std::string filter)
        : parent_(parent), idx_(idx), filter_(std::move(filter))
    {
        skip();
    }
    inline xml_node operator*() const;
    xml_node_iterator &operator++()
    {
        ++idx_;
        skip();
        return *this;
    }
    bool operator!=(const xml_node_iterator &o) const
    {
        return idx_ != o.idx_;
    }

  private:
    void skip()
    {
        if (!parent_ || filter_.empty())
            return;
        while (idx_ < parent_->children.size() &&
               parent_->children[idx_]->name != filter_)
            ++idx_;
    }
    const xml_node_struct *parent_;
    size_t idx_;
    std::string filter_;
};

class xml_node_range
{
  public:
    xml_node_range(const xml_node_struct *parent, std::string filter)
        : parent_(parent), filter_(std::move(filter))
    {
    }
    xml_node_iterator begin() const
    {
        return xml_node_iterator(parent_, 0, filter_);
    }
    xml_node_iterator end() const
    {
        return xml_node_iterator(
            parent_, parent_ ? parent_->children.size() : 0, "");
    }

  private:
    const xml_node_struct *parent_;
    std::string filter_;
};

class xml_node
{
  public:
    xml_node() = default;
    explicit xml_node(const xml_node_struct *n) : n_(n) {}

    const char *name() const { return n_ ? n_->name.c_str() : ""; }
    bool empty() const { return n_ == nullptr; }
    explicit operator bool() const { return n_ != nullptr; }
    bool operator!() const { return n_ == nullptr; }

    xml_node child(const char *nm) const
    {
        if (n_)
            for (const auto &c : n_->children)
                if (c->name == nm)
                    return xml_node(c.get());
        return xml_node();
    }
    xml_attribute attribute(const char *nm) const
    {
        if (n_)
            for (const auto &a : n_->attrs)
                if (a.name == nm)
                    return xml_attribute(&a);
        return xml_attribute();
    }
    xml_node_range children() const { return xml_node_range(n_, ""); }
    xml_node_range children(const char *nm) const
    {
        return xml_node_range(n_, nm);
    }

  private:
    const xml_node_struct *n_ = nullptr;
};

inline xml_node xml_node_iterator::operator*() const
{
    return xml_node(parent_->children[idx_].get());
}

struct xml_parse_result
{
    bool ok = false;
    explicit operator bool() const { return ok; }
    bool operator!() const { return !ok; }
};

class xml_document
{
  public:
    xml_parse_result load_file(const char *path)
    {
        std::ifstream f(path, std::ios::binary);
        xml_parse_result r;
        if (!f)
            return r;
        std::ostringstream ss;
        ss << f.rdbuf();
        std::string text = ss.str();
        root_ = std::make_unique<xml_node_struct>();
        r.ok = parse(text);
        if (!r.ok)
            root_.reset();
        return r;
    }
    xml_node child(const char *nm) const
    {
        return xml_node(root_.get()).child(nm);
    }

  private:
    static void decode_entities(std::string *s)
    {
        static const struct
        {
            const char *ent;
            char ch;
        } table[] = {{"&lt;", '<'},
                     {"&gt;", '>'},
                     {"&amp;", '&'},
                     {"&quot;", '"'},
                     {"&apos;", '\''}};
        size_t pos = 0;
        while ((pos = s->find('&', pos)) != std::string::npos)
        {
            bool hit = false;
            for (const auto &e : table)
            {
                size_t n = std::strlen(e.ent);
                if (s->compare(pos, n, e.ent) == 0)
                {
                    s->replace(pos, n, 1, e.ch);
                    hit = true;
                    break;
                }
            }
            pos += hit ? 1 : 1;
        }
    }

    bool parse(const std::string &t)
    {
        size_t i = 0;
        const size_t n = t.size();
        std::vector<xml_node_struct *> stack{root_.get()};
        while (i < n)
        {
            size_t lt = t.find('<', i);
            if (lt == std::string::npos)
                break;
            i = lt + 1;
            if (i >= n)
                return false;
            if (t[i] == '?')
            { // declaration
                size_t e = t.find("?>", i);
                if (e == std::string::npos)
                    return false;
                i = e + 2;
                continue;
            }
            if (t.compare(i, 3, "!--") == 0)
            { // comment
                size_t e = t.find("-->", i);
                if (e == std::string::npos)
                    return false;
                i = e + 3;
                continue;
            }
            if (t[i] == '!')
            { // DOCTYPE / CDATA: skip to '>'
                size_t e = t.find('>', i);
                if (e == std::string::npos)
                    return false;
                i = e + 1;
                continue;
            }
            if (t[i] == '/')
            { // closing tag
                size_t e = t.find('>', i);
                if (e == std::string::npos || stack.size() <= 1)
                    return false;
                stack.pop_back();
                i = e + 1;
                continue;
            }
            // element
            size_t j = i;
            while (j < n && !std::isspace((unsigned char)t[j]) &&
                   t[j] != '>' && t[j] != '/')
                ++j;
            auto node = std::make_unique<xml_node_struct>();
            node->name = t.substr(i, j - i);
            i = j;
            // attributes
            while (true)
            {
                while (i < n && std::isspace((unsigned char)t[i]))
                    ++i;
                if (i >= n)
                    return false;
                if (t[i] == '>' || t[i] == '/')
                    break;
                size_t k = i;
                while (k < n && t[k] != '=' &&
                       !std::isspace((unsigned char)t[k]))
                    ++k;
                std::string aname = t.substr(i, k - i);
                while (k < n && (std::isspace((unsigned char)t[k]) || t[k] == '='))
                    ++k;
                if (k >= n || (t[k] != '"' && t[k] != '\''))
                    return false;
                char q = t[k++];
                size_t e = t.find(q, k);
                if (e == std::string::npos)
                    return false;
                std::string aval = t.substr(k, e - k);
                decode_entities(&aval);
                node->attrs.push_back({std::move(aname), std::move(aval)});
                i = e + 1;
            }
            bool self_close = false;
            if (t[i] == '/')
            {
                self_close = true;
                ++i;
                if (i >= n || t[i] != '>')
                    return false;
            }
            xml_node_struct *raw = node.get();
            stack.back()->children.push_back(std::move(node));
            if (!self_close)
                stack.push_back(raw);
            ++i; // past '>'
        }
        return stack.size() == 1;
    }

    std::unique_ptr<xml_node_struct> root_;
};

} // namespace pugi
